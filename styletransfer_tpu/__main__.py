"""Entry point: ``python -m styletransfer_tpu <group> <task>``.

Same dispatch contract as the reference ``python -m stransfer``
(reference ``__main__.py:1-6``), including the colored-traceback hook when
the optional dependency is installed.
"""

try:
    import colored_traceback

    colored_traceback.add_hook()
except ImportError:
    pass

from styletransfer_tpu.clis import cli

if __name__ == "__main__":
    cli(prog_name="styletransfer_tpu")
