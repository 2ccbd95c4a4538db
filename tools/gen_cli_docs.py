#!/usr/bin/env python
"""Generate docs/cli.md from the live argparse surface so the CLI
reference can never drift from the code. Run: python tools/gen_cli_docs.py
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topaz_tpu.cli.main import _command_modules  # noqa: E402


def main():
    out = io.StringIO()
    out.write("# CLI reference\n\n")
    out.write("Generated from the argparse definitions by "
              "`tools/gen_cli_docs.py` — do not edit by hand.\n")
    for group, mods in _command_modules():
        out.write(f"\n## {group}\n")
        for mod in mods:
            import argparse

            try:
                parser = mod.add_arguments()
            except TypeError:  # modules whose add_arguments requires a parser
                parser = argparse.ArgumentParser()
                mod.add_arguments(parser)
            parser.prog = f"topaz {mod.name}"
            out.write(f"\n### `topaz {mod.name}`\n\n{mod.help}\n\n```text\n")
            buf = io.StringIO()
            with redirect_stdout(buf):
                parser.print_help()
            out.write(buf.getvalue().rstrip() + "\n```\n")
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "cli.md")
    with open(dest, "w") as f:
        f.write(out.getvalue())
    print(f"wrote {dest} ({len(out.getvalue())} bytes)")


if __name__ == "__main__":
    main()
