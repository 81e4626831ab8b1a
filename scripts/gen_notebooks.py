"""Regenerate notebooks/ from the runnable examples/ scripts.

Each notebook = a markdown cell (the example's module docstring) + one code
cell (the example body with the CI smoke-mode boilerplate stripped — the
notebooks always run the full-size demos).

Run:  python scripts/gen_notebooks.py
"""

from __future__ import annotations

import ast
import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def _title(stem: str) -> str:
    return stem.replace("_", " ").title().replace("Wssvqe", "WSSVQE") \
        .replace("Quccsd", "QUCCSD").replace("Puccgsd", "pUCCGSD")


def convert(src_path: pathlib.Path) -> dict:
    src = src_path.read_text()
    mod = ast.parse(src)
    doc = ast.get_docstring(mod) or ""
    body = src
    if doc:
        # drop the docstring literal
        body = re.sub(r'^\s*(?:\'\'\'|""").*?(?:\'\'\'|""")\s*\n', "", body,
                      count=1, flags=re.S)
    # strip the CI smoke knob: the notebook runs the full demo
    body = body.replace(
        'import os\n\nSMOKE = os.environ.get("OVQE_SMOKE") == "1"'
        '  # CI smoke mode\n\n', "")
    body = re.sub(r"(\d+) if SMOKE else (\d+)", r"\2", body)
    body = body.strip() + "\n"

    md = f"# {_title(src_path.stem)}\n\n{doc.strip()}"
    return {
        "cells": [
            {"cell_type": "markdown", "metadata": {},
             "source": md.splitlines(keepends=True)},
            {"cell_type": "code", "execution_count": None, "metadata": {},
             "outputs": [], "source": body.splitlines(keepends=True)},
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    out_dir = REPO / "notebooks"
    out_dir.mkdir(exist_ok=True)
    for script in sorted((REPO / "examples").glob("*.py")):
        nb = convert(script)
        out = out_dir / (script.stem + ".ipynb")
        out.write_text(json.dumps(nb, indent=1))
        print("wrote", out.relative_to(REPO))


if __name__ == "__main__":
    main()
