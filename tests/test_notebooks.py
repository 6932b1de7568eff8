"""Execute the generated documentation notebooks in a Jupyter kernel.

The --nbval tier analog (reference pytest addopts run mesh/mesh-examples
and multigrid notebooks as tests): docs/make_notebooks.py derives one
notebook per docs/examples script; each is executed end-to-end here with
nbclient and must raise no errors.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docs.make_notebooks import EXAMPLES, script_to_notebook  # noqa: E402

NAMES = sorted(n for n in os.listdir(EXAMPLES)
               if n.endswith(".py") and not n.startswith("__"))


REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.parametrize("name", [
    n if n.startswith("01") else pytest.param(n, marks=pytest.mark.slow)
    for n in NAMES])
def test_notebook_executes(name, tmp_path):
    import nbformat
    from nbclient import NotebookClient

    nb = script_to_notebook(os.path.join(EXAMPLES, name))
    # test-only setup: import path + CPU platform (the site hook forces
    # the axon backend; docs must execute on any host)
    nb.cells.insert(0, nbformat.v4.new_code_cell(
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)"))
    client = NotebookClient(nb, timeout=600,
                            resources={"metadata": {"path": str(tmp_path)}})
    client.execute()

    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", \
                (name, out.get("ename"), out.get("evalue"))
