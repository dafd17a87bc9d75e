"""Command-line interface.

Same contract as the reference: ``python -m styletransfer_tpu <group> <task>``
with groups ``gatys_st``, ``fast_st``, ``video_st`` and identical option
names/defaults (reference ``stransfer/clis/__init__.py:6-15``), plus the
framework-added ``doctor`` environment diagnostics.
"""

import click

from styletransfer_tpu.clis import doctor, fast_st, gatys_st, video_st


@click.group(
    commands={
        "video_st": video_st.video_st,
        "fast_st": fast_st.fast_st,
        "gatys_st": gatys_st.gatys_st,
        "doctor": doctor.doctor,
    }
)
def cli():
    """Style Transfer (TPU-native)"""
