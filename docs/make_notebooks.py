#!/usr/bin/env python3
"""Generate Jupyter notebooks from the executable docs/examples scripts.

The reference ships real notebooks executed in CI via --nbval
(/root/reference/pyproject.toml pytest addopts; mesh/mesh-examples.ipynb,
multigrid/*.ipynb).  Here the single source of truth is the
docs/examples/*.py scripts (plain, diffable, tested by
tests/test_docs_examples.py); this generator derives a notebook per
script -- markdown cell from the module docstring, a code cell with the
script body, and a final cell running `main()` into a temp directory --
and tests/test_notebooks.py executes every generated notebook in a real
Jupyter kernel (the --nbval tier).

Usage: python docs/make_notebooks.py [out_dir]   (default docs/notebooks)
"""

import ast
import os
import sys

import nbformat

EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples")


def script_to_notebook(path):
    with open(path) as fh:
        src = fh.read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""

    # strip shebang, module docstring, and the __main__ guard
    lines = src.splitlines()
    body_start = tree.body[1].lineno - 1 if (
        tree.body and isinstance(tree.body[0], ast.Expr)) else 0
    guard = next((n.lineno - 1 for n in tree.body
                  if isinstance(n, ast.If)
                  and getattr(getattr(n.test, "left", None), "id", "")
                  == "__name__"), len(lines))
    body = "\n".join(lines[body_start:guard]).strip()

    nb = nbformat.v4.new_notebook()
    title = os.path.basename(path)[:-3]
    nb.cells = [
        nbformat.v4.new_markdown_cell(f"# {title}\n\n{doc}"),
        nbformat.v4.new_code_cell(
            "import matplotlib\nmatplotlib.use('Agg')"),
        nbformat.v4.new_code_cell(body),
        nbformat.v4.new_code_cell(
            "import inspect, tempfile\n"
            "args = ([tempfile.mkdtemp()]\n"
            "        if len(inspect.signature(main).parameters) else [])\n"
            "main(*args)"),
    ]
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    return nb


def main(out_dir=None):
    out_dir = out_dir or os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "notebooks")
    os.makedirs(out_dir, exist_ok=True)
    made = []
    for name in sorted(os.listdir(EXAMPLES)):
        if not name.endswith(".py") or name.startswith("__"):
            continue
        nb = script_to_notebook(os.path.join(EXAMPLES, name))
        out = os.path.join(out_dir, name[:-3] + ".ipynb")
        nbformat.write(nb, out)
        made.append(out)
    print(f"wrote {len(made)} notebooks to {out_dir}")
    return made


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
