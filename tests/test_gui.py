"""GUI smoke tests (skipped when no display is available — this container
has no X server; the module itself is import-safe headless)."""

import numpy as np
import pytest


def _has_display() -> bool:
    try:
        import tkinter

        root = tkinter.Tk()
        root.destroy()
        return True
    except Exception:
        return False


def test_gui_module_imports_headless():
    """The module must import (and the CLI flag exist) without a display."""
    import gccnmf_tpu.gui as gui

    assert hasattr(gui, "RealtimeGCCNMFWindow")
    assert hasattr(gui, "run_gui")


@pytest.mark.skipif(not _has_display(), reason="no display available")
def test_gui_window_lifecycle(tmp_path, stereo_signal):
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.gui import RealtimeGCCNMFWindow
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF
    from gccnmf_tpu.utils import wav as wavio

    mix, sr = stereo_signal
    path = str(tmp_path / "mix.wav")
    wavio.write_wav(mix, path, sr)
    rng = np.random.default_rng(0)
    w16 = rng.random((513, 16)).astype(np.float32) + 1e-3
    app = RealtimeGCCNMF(
        path,
        config=load_config(None, dictionary_size=16, dictionary_sizes=(16,)),
        dictionaries={"Pretrained": {16: w16}},
    )
    win = RealtimeGCCNMFWindow(app, loop=False)
    # process a few blocks directly, then force one repaint and close
    from gccnmf_tpu.realtime.audio import FilePlayerSource

    src = FilePlayerSource(path, app.config.block_size)
    for i, block in enumerate(src.blocks()):
        app.process_block(block)
        if i >= 3:
            break
    win.root.update()
    win._refresh()
    win.close()
