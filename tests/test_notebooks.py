"""Execute the five tutorial notebooks end-to-end (smoke mode).

The reference's de-facto integration tests are its notebooks (SURVEY §4);
here they are *actual* tests: each is executed cell-by-cell in a fresh
kernel with ``GCCNMF_NB_FAST=1`` (tiny configs, CPU backend) and must run
without errors. Also pins that the committed .ipynb files stay in sync
with their generator (notebooks/build_notebooks.py).
"""

import os
import sys

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_DIR = os.path.join(REPO, "notebooks")

NOTEBOOKS = [
    "offlineSpeechSeparation.ipynb",
    "offlineSpeechEnhancement.ipynb",
    "onlineSpeechEnhancement.ipynb",
    "lowLatencySpeechEnhancement.ipynb",
    "realtimeSpeechEnhancement.ipynb",
]


def test_generator_in_sync():
    """The committed notebooks match what build_notebooks.py generates."""
    sys.path.insert(0, NB_DIR)
    try:
        import build_notebooks
    finally:
        sys.path.pop(0)
    for name, builder in build_notebooks.NOTEBOOKS.items():
        on_disk = nbformat.read(os.path.join(NB_DIR, name), as_version=4)
        generated = builder()
        assert [c.source for c in on_disk.cells] == [
            c.source for c in generated.cells
        ], f"{name} is stale — rerun notebooks/build_notebooks.py"


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes(name, tmp_path, monkeypatch):
    monkeypatch.setenv("GCCNMF_NB_FAST", "1")
    monkeypatch.setenv("GCCNMF_NB_OUTDIR", str(tmp_path))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    nb = nbformat.read(os.path.join(NB_DIR, name), as_version=4)
    client = nbclient.NotebookClient(
        nb,
        timeout=300,
        kernel_name="python3",
        resources={"metadata": {"path": NB_DIR}},
    )
    client.execute()
    # every code cell actually ran
    for cell in nb.cells:
        if cell.cell_type == "code":
            assert cell.execution_count is not None
