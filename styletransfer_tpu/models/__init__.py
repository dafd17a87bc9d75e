"""Model definitions: VGG19 feature/loss network and transform nets."""

from styletransfer_tpu.models import transformer, vgg  # noqa: F401
