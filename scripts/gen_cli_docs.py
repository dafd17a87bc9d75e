#!/usr/bin/env python
"""Generate docs/terminal_interface.md from the click CLI definitions.

The reference auto-generates its CLI page with sphinx-click
(/root/reference/docs/terminal_interface.rst:4-6, docs/conf.py:31-37) so the
docs can never drift from the code. This script is the same idea without the
Sphinx dependency: it walks ``styletransfer_tpu.clis.cli`` and emits a
markdown reference. Run with ``--check`` (CI does) to fail when the committed
file is stale.

Usage:
    python scripts/gen_cli_docs.py            # rewrite docs/terminal_interface.md
    python scripts/gen_cli_docs.py --check    # exit 1 if the file is stale
"""

from __future__ import annotations

import os
import sys
import textwrap

import click

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC_PATH = os.path.join(REPO_ROOT, "docs", "terminal_interface.md")

if REPO_ROOT not in sys.path:  # runnable without installing the package
    sys.path.insert(0, REPO_ROOT)

HEADER = """\
# Terminal interface

<!-- GENERATED FILE — do not edit by hand.
     Regenerate with: python scripts/gen_cli_docs.py
     CI runs `python scripts/gen_cli_docs.py --check` and fails on drift. -->

Invocation: `python -m styletransfer_tpu <group> <task> [options]`
(identical contract to the reference `python -m stransfer`).
"""


def _fmt_default(param: click.Option) -> str:
    if param.is_flag:
        return "off" if not param.default else "on"
    if param.default is None:
        return "—"
    return f"`{param.default}`"


def _help_text(cmd: click.Command) -> str:
    if not cmd.help:
        return ""
    return textwrap.dedent(cmd.help).strip()


def _usage(cmd: click.Command, path: str) -> str:
    args = " ".join(
        p.make_metavar(click.Context(cmd))
        if hasattr(p, "make_metavar")
        else p.name.upper()
        for p in cmd.params
        if isinstance(p, click.Argument)
    )
    parts = [f"python -m styletransfer_tpu {path}"]
    if args:
        parts.append(args)
    parts.append("[options]")
    return " ".join(parts)


def _options_table(cmd: click.Command) -> str:
    opts = [p for p in cmd.params if isinstance(p, click.Option)]
    if not opts:
        return ""
    lines = ["| Option | Default | Help |", "|---|---|---|"]
    for p in opts:
        names = ", ".join(f"`{o}`" for o in p.opts)
        help_txt = (p.help or "").replace("\n", " ").strip()
        lines.append(f"| {names} | {_fmt_default(p)} | {help_txt} |")
    return "\n".join(lines)


def _render_command(cmd: click.Command, path: str, level: int) -> str:
    out = [f"{'#' * level} `{path.split(' ')[-1]}`", ""]
    help_txt = _help_text(cmd)
    if help_txt:
        out.extend([help_txt, ""])
    out.extend(["```", _usage(cmd, path), "```", ""])
    table = _options_table(cmd)
    if table:
        out.extend([table, ""])
    return "\n".join(out)


def render() -> str:
    from styletransfer_tpu.clis import cli

    sections = [HEADER]
    for name in cli.commands:
        cmd = cli.commands[name]
        if isinstance(cmd, click.Group):
            title = _help_text(cmd) or name
            sections.append(f"## `{name}` — {title}\n")
            for sub_name in cmd.commands:
                sections.append(
                    _render_command(cmd.commands[sub_name], f"{name} {sub_name}", 3)
                )
        else:
            sections.append(_render_command(cmd, name, 2))
    return "\n".join(sections).rstrip() + "\n"


def main() -> int:
    content = render()
    if "--check" in sys.argv:
        with open(DOC_PATH) as f:
            on_disk = f.read()
        if on_disk != content:
            sys.stderr.write(
                "docs/terminal_interface.md is stale. Regenerate with:\n"
                "  python scripts/gen_cli_docs.py\n"
            )
            return 1
        print("docs/terminal_interface.md is up to date")
        return 0
    with open(DOC_PATH, "w") as f:
        f.write(content)
    print(f"wrote {DOC_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
