"""GUI tests.

The widget logic (mask-editor model, matplotlib rendering, region drag)
runs headlessly on the Agg backend with synthetic mouse events — only the
Tk window lifecycle needs a display and stays gated.
"""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg", force=True)

from gccnmf_tpu.gui_model import (  # noqa: E402
    MaskEditorModel,
    generalized_gaussian,
    normalized_mean_gcc,
    target_window_curve,
    visualized_dictionary,
)


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
    assert hasattr(gui, "GCCNMFFigureView")
    assert hasattr(gui, "run_gui")


# --------------------------------------------------------------------- model


def test_slider_mappings_match_reference_formulas():
    """Exact parity with TargetWindowFunctionPlot's getters
    (reference gccNMFInterface.py:560-577): the reference divides 0-100
    integer sliders by 100; the model stores that fraction directly."""
    n = 128
    for v in range(0, 101, 7):
        frac = v / 100.0
        m = MaskEditorModel(
            n, center_frac=frac, width_frac=frac, shape_frac=frac, floor_frac=frac
        )
        assert m.tdoa == pytest.approx(frac * n)
        assert m.window_width == pytest.approx(max(frac * n, m.MIN_WIDTH))
        assert m.beta == pytest.approx(np.exp(frac * 10.0 - 5.0))
        assert m.noise_floor == pytest.approx(frac)


def test_parameter_setters_round_trip():
    m = MaskEditorModel(64)
    m.set_tdoa(20.0)
    m.set_window_width(5.0)
    m.set_beta(2.0)
    m.set_noise_floor(0.25)
    assert m.tdoa == pytest.approx(20.0)
    assert m.window_width == pytest.approx(5.0)
    assert m.beta == pytest.approx(2.0)
    assert m.noise_floor == pytest.approx(0.25)
    # out-of-range values clamp instead of leaving the grid
    m.set_tdoa(1e6)
    assert m.tdoa == pytest.approx(64.0)
    m.set_beta(1e9)
    assert m.shape_frac == 1.0


def test_region_two_way_binding():
    m = MaskEditorModel(64)
    m.set_region(10.0, 30.0)
    assert m.tdoa == pytest.approx(20.0)
    assert m.window_width == pytest.approx(10.0)
    lo, hi = m.region
    assert (lo, hi) == (pytest.approx(10.0), pytest.approx(30.0))
    # reversed/degenerate input is normalized, not propagated
    m.set_region(40.0, 25.0)
    assert m.tdoa == pytest.approx(32.5)
    m.set_region(12.0, 12.0)
    assert m.window_width == pytest.approx(m.MIN_WIDTH)
    # region is clipped to the grid like the reference's LinearRegionItem
    # bounds=[0, numTDOAs-1] (gccNMFInterface.py:268-269)
    m.set_tdoa(62.0)
    m.set_window_width(20.0)
    assert m.region[1] == pytest.approx(63.0)


def test_shift_region_preserves_width():
    m = MaskEditorModel(64)
    m.set_region(10.0, 20.0)
    m.shift_region(7.0)
    assert m.window_width == pytest.approx(5.0)
    assert m.tdoa == pytest.approx(22.0)


def test_target_window_curve_matches_reference_normalization():
    """The drawn curve is genGauss → min-subtracted → max-normalized →
    squeezed into [floor, 1] (reference updateData, :550-558)."""
    n, mu, alpha, beta, floor = 96, 40.0, 6.0, 1.5, 0.2
    x = np.arange(n, dtype=np.float64)
    ref = np.exp(-((np.abs(x - mu) / alpha) ** beta))
    ref -= ref.min()
    ref = ref / ref.max() * (1 - floor) + floor
    got = target_window_curve(n, mu, alpha, beta, floor)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert got.min() == pytest.approx(floor, abs=1e-6)
    assert got.max() == pytest.approx(1.0, abs=1e-6)
    # and the raw kernel matches the reference's generalizedGaussian (:531)
    np.testing.assert_allclose(
        generalized_gaussian(x, alpha, beta, mu), np.exp(-((np.abs(x - mu) / alpha) ** beta))
    )


def test_stream_params_feed_the_hot_path():
    m = MaskEditorModel(64)
    m.set_region(8.0, 24.0)
    m.set_beta(3.0)
    m.set_noise_floor(0.1)
    p = m.stream_params()
    assert set(p) == {"target_tdoa_index", "epsilon", "beta", "noise_floor"}
    assert p["target_tdoa_index"] == pytest.approx(16.0)
    assert p["epsilon"] == pytest.approx(8.0)


def test_visualized_dictionary_is_centroid_ordered_and_inverted():
    rng = np.random.default_rng(7)
    w = rng.random((33, 8)).astype(np.float32) + 1e-3
    # give atoms distinct centroids
    w[:5, 0] += 5.0  # low-frequency atom
    w[-5:, 3] += 5.0  # high-frequency atom
    img = visualized_dictionary(w)
    assert img.shape == w.shape
    assert img.min() >= 0.0 and img.max() <= 1.0
    # centroid order: recompute on the displayed (un-inverted) image
    mag = (1.0 - img.astype(np.float64)) ** 3.0
    f = np.arange(w.shape[0], dtype=np.float64)
    centroids = (f[:, None] * mag).sum(0) / mag.sum(0)
    assert np.all(np.diff(centroids) >= -1e-9)
    # inversion: the dictionary's global peak maps to 0 (black)
    assert img.min() == pytest.approx(0.0, abs=1e-6)


def test_normalized_mean_gcc():
    hist = np.stack([np.linspace(0, 1, 16), 2.0 * np.linspace(0, 1, 16)])
    curve = normalized_mean_gcc(hist)
    assert curve is not None and curve.shape == (16,)
    assert curve.min() == pytest.approx(0.0) and curve.max() == pytest.approx(1.0)
    assert normalized_mean_gcc(np.zeros((0, 16))) is None
    assert normalized_mean_gcc(np.ones((4, 16))) is None  # flat


# ---------------------------------------------------------------- figure view


@pytest.fixture()
def gui_app(tmp_path, stereo_signal):
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF
    from gccnmf_tpu.utils import wav as wavio

    mix, sr = stereo_signal
    path = str(tmp_path / "mix.wav")
    wavio.write_wav(mix, path, sr)
    rng = np.random.default_rng(0)
    dicts = {
        "Pretrained": {
            16: rng.random((513, 16)).astype(np.float32) + 1e-3,
            8: rng.random((513, 8)).astype(np.float32) + 1e-3,
        }
    }
    return RealtimeGCCNMF(
        path,
        config=load_config(
            None,
            dictionary_size=16,
            dictionary_sizes=(8, 16),
            localization_enabled=False,
        ),
        dictionaries=dicts,
    )


def _make_view(app):
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    from gccnmf_tpu.gui import GCCNMFFigureView

    fig = Figure(figsize=(11, 7), dpi=90)
    FigureCanvasAgg(fig)
    changed = []
    view = GCCNMFFigureView(fig, app, on_params_changed=changed.append)
    fig.canvas.draw()  # realize transforms for synthetic mouse events
    return view, fig, changed


def _mouse(fig, ax, name, xdata, ydata=0.5):
    """Synthesize a matplotlib MouseEvent at a data coordinate of ``ax``."""
    from matplotlib.backend_bases import MouseEvent

    xpix, ypix = ax.transData.transform((xdata, ydata))
    return MouseEvent(name, fig.canvas, xpix, ypix, button=1)


def test_figure_view_refresh_headless(gui_app):
    view, fig, _ = _make_view(gui_app)
    block = np.zeros((2, gui_app.config.block_size), np.float32)
    rng = np.random.default_rng(3)
    for _ in range(4):
        gui_app.process_block(rng.standard_normal(block.shape).astype(np.float32) * 0.1)
    view.refresh()
    fig.canvas.draw()
    assert "in" in view._images and "dict" in view._images
    # dictionary panel is the centroid-ordered, inverted image
    shown = np.asarray(view._images["dict"].get_array())
    expected = visualized_dictionary(np.asarray(gui_app.processor.w))
    np.testing.assert_allclose(shown, expected, rtol=1e-5)
    # the live mean-GCC curve was populated
    assert view._gcc_line.get_xdata().size == gui_app.config.num_tdoas
    # the localized-TDOA track rides the GCC waterfall
    track = view._tdoa_track.get_ydata()
    assert track.size == gui_app.config.num_tdoa_history
    assert np.isfinite(track).all()


def test_region_drag_updates_engine_params(gui_app):
    view, fig, changed = _make_view(gui_app)
    m = view.model
    m.set_region(20.0, 30.0)
    view._redraw_editor()
    # grab the region body at its center and drag it +8 TDOA bins
    ax = view.ax_curve
    view._on_press(_mouse(fig, ax, "button_press_event", 25.0))
    assert view._drag is not None and view._drag[0] == "move"
    view._on_motion(_mouse(fig, ax, "motion_notify_event", 33.0))
    view._on_release(_mouse(fig, ax, "button_release_event", 33.0))
    assert view._drag is None
    assert m.tdoa == pytest.approx(33.0, abs=0.2)
    assert m.window_width == pytest.approx(5.0, abs=0.2)
    # the hot engine params followed the drag (no recompile path)
    assert float(np.asarray(gui_app.params.target_tdoa_index)) == pytest.approx(
        m.tdoa, abs=1e-4
    )
    assert float(np.asarray(gui_app.params.target_epsilon)) == pytest.approx(
        m.window_width, abs=1e-4
    )
    assert changed, "on_params_changed must fire so the shell can sync sliders"


def test_region_edge_drag_resizes(gui_app):
    view, fig, _ = _make_view(gui_app)
    m = view.model
    m.set_region(20.0, 30.0)
    view._redraw_editor()
    ax = view.ax_curve
    # grab the hi edge and pull it out to 40
    view._on_press(_mouse(fig, ax, "button_press_event", 30.0))
    assert view._drag is not None and view._drag[0] == "hi"
    view._on_motion(_mouse(fig, ax, "motion_notify_event", 40.0))
    view._on_release(_mouse(fig, ax, "button_release_event", 40.0))
    assert m.region[1] == pytest.approx(40.0, abs=0.2)
    assert m.region[0] == pytest.approx(20.0, abs=0.2)
    assert float(np.asarray(gui_app.params.target_epsilon)) == pytest.approx(
        m.window_width, abs=1e-4
    )


def test_body_drag_against_edge_preserves_width(gui_app):
    """Translating the region into a grid edge must not narrow epsilon
    (pyqtgraph LinearRegionItem semantics: clamp the offset, keep the
    span)."""
    view, fig, _ = _make_view(gui_app)
    m = view.model
    n = gui_app.config.num_tdoas
    m.set_region(n - 22.0, n - 12.0)  # width 5, near the right edge
    view._redraw_editor()
    ax = view.ax_curve
    mid = n - 17.0
    view._on_press(_mouse(fig, ax, "button_press_event", mid))
    assert view._drag is not None and view._drag[0] == "move"
    view._on_motion(_mouse(fig, ax, "motion_notify_event", n - 2.0))
    view._on_release(None)
    assert m.window_width == pytest.approx(5.0, abs=0.2)
    assert float(np.asarray(gui_app.params.target_epsilon)) == pytest.approx(
        m.window_width, abs=1e-4
    )


def test_tdoa_track_stays_on_axes_after_refresh(gui_app):
    """The localized-TDOA track must remain ATTACHED to the GCC waterfall
    axes across refreshes: ax.clear() in the image path used to detach it,
    after which set_data silently updated an orphaned artist and the track
    never rendered (ADVICE r2, medium)."""
    view, fig, _ = _make_view(gui_app)
    rng = np.random.default_rng(7)
    block_shape = (2, gui_app.config.block_size)
    for _ in range(3):
        gui_app.process_block(
            rng.standard_normal(block_shape).astype(np.float32) * 0.1
        )
    for _ in range(2):  # first refresh creates images, second updates them
        view.refresh()
        fig.canvas.draw()
        assert view._tdoa_track.axes is view.ax_gcc
        assert view._tdoa_track in view.ax_gcc.lines
    # shape-change path (image recreated) must not detach it either
    gcc_img = view._images["gcc"]
    small = np.asarray(gcc_img.get_array())[:, :4]
    view._imshow(view.ax_gcc, "gcc", small)
    assert view._tdoa_track.axes is view.ax_gcc
    assert view._tdoa_track in view.ax_gcc.lines


def test_body_drag_of_clipped_region_preserves_width(gui_app):
    """Grabbing the body while the region is ALREADY clipped at a grid edge
    must keep the model's window width: deriving width from the clipped
    (lo, hi) span at press time silently narrowed epsilon (ADVICE r2)."""
    view, fig, _ = _make_view(gui_app)
    m = view.model
    n = gui_app.config.num_tdoas
    m.set_tdoa(n - 2.0)
    m.set_window_width(5.0)  # region (n-7, n-1): hi clipped, span < 2*width
    view._redraw_editor()
    lo, hi = m.region
    assert hi - lo < 2 * m.window_width - 0.5, "precondition: region clipped"
    ax = view.ax_curve
    view._on_press(_mouse(fig, ax, "button_press_event", (lo + hi) / 2.0))
    assert view._drag is not None and view._drag[0] == "move"
    view._on_motion(
        _mouse(fig, ax, "motion_notify_event", (lo + hi) / 2.0 - 10.0)
    )
    view._on_release(None)
    assert m.window_width == pytest.approx(5.0, abs=0.2)


def test_body_drag_of_clipped_region_translates_true_center(gui_app):
    """The clipped span's middle is NOT the center: grabbing the body of a
    region clipped at a grid edge must translate the model's true TDOA by
    the drag delta, not teleport it to the visible span's midpoint."""
    view, fig, _ = _make_view(gui_app)
    m = view.model
    m.set_tdoa(1.0)
    m.set_window_width(5.0)  # region clips at 0: visible middle != 1.0
    view._redraw_editor()
    lo, hi = m.region
    assert abs((lo + hi) / 2.0 - m.tdoa) > 0.5, "precondition: center off"
    ax = view.ax_curve
    grab = (lo + hi) / 2.0
    view._on_press(_mouse(fig, ax, "button_press_event", grab))
    assert view._drag is not None and view._drag[0] == "move"
    view._on_motion(_mouse(fig, ax, "motion_notify_event", grab + 0.25))
    view._on_release(None)
    assert m.tdoa == pytest.approx(1.25, abs=1e-6)


def test_disabling_localization_hands_center_to_engine(gui_app):
    """After online localization is switched off, the engine's manual
    target index must equal the last followed TDOA, not the stale
    pre-localization value."""
    view, fig, _ = _make_view(gui_app)
    view.set_localization(True)
    rng = np.random.default_rng(21)
    for _ in range(5):
        gui_app.process_block(
            rng.standard_normal((2, gui_app.config.block_size)).astype(np.float32)
            * 0.1
        )
    view.refresh()  # follow: model center ← localized TDOA
    followed = view.model.tdoa
    stale = float(np.asarray(gui_app.params.target_tdoa_index))
    view.set_localization(False)
    pushed = float(np.asarray(gui_app.params.target_tdoa_index))
    assert pushed == pytest.approx(followed, abs=1e-4)
    if abs(followed - stale) > 1e-3:
        assert pushed != pytest.approx(stale, abs=1e-4)


def test_slider_edits_move_region_and_curve(gui_app):
    view, fig, _ = _make_view(gui_app)
    view.set_model_params(tdoa=12.0, width=4.0, beta=2.5, noise_floor=0.3)
    lo, hi = view.model.region
    assert (lo, hi) == (pytest.approx(8.0), pytest.approx(16.0))
    patch = view._region_patch
    if hasattr(patch, "get_width"):  # Rectangle (matplotlib >= 3.8)
        span = (patch.get_x(), patch.get_x() + patch.get_width())
    else:
        xs = patch.get_xy()[:, 0]
        span = (xs.min(), xs.max())
    assert span == (pytest.approx(8.0), pytest.approx(16.0))
    curve = view._curve_line.get_ydata()
    assert curve.min() == pytest.approx(0.3, abs=1e-5)
    assert float(np.asarray(gui_app.params.target_beta)) == pytest.approx(2.5)
    assert float(np.asarray(gui_app.params.noise_floor)) == pytest.approx(0.3)


def test_localization_follow_drives_center(gui_app):
    view, fig, changed = _make_view(gui_app)
    gui_app.set_localization(True, window_size=4)
    rng = np.random.default_rng(5)
    for _ in range(6):
        gui_app.process_block(
            rng.standard_normal((2, gui_app.config.block_size)).astype(np.float32) * 0.1
        )
    width_before = view.model.window_width
    view.refresh()
    tdoa = gui_app.histories["tdoa"].get(1)
    assert tdoa.size == 1
    assert view.model.tdoa == pytest.approx(float(tdoa[-1]), abs=1e-4)
    assert view.model.window_width == pytest.approx(width_before)
    assert changed, "follow must notify the shell to move its sliders"
    # while localization owns the center, body drags are rejected...
    view.model.set_window_width(6.0)
    view._redraw_editor()
    mid = view.model.tdoa
    view._on_press(_mouse(fig, view.ax_curve, "button_press_event", mid))
    assert view._drag is None
    # ...but edge resizes stay allowed
    lo, hi = view.model.region
    view._on_press(_mouse(fig, view.ax_curve, "button_press_event", hi))
    assert view._drag is not None and view._drag[0] == "hi"
    view._on_release(None)


def test_per_size_mask_histories_persist_across_switches(gui_app):
    """Switching dictionary size swaps the active mask waterfall and keeps
    the old size's history (reference per-size shared buffers,
    runRealtimeGCCNMF.py:74-81)."""
    rng = np.random.default_rng(9)
    block = lambda: rng.standard_normal((2, gui_app.config.block_size)).astype(
        np.float32
    ) * 0.1
    for _ in range(3):
        gui_app.process_block(block())
    h16 = gui_app.histories["coefficient_mask"]
    assert h16.num_values > 0
    filled_16 = h16.num_values

    gui_app.set_dictionary(size=8)
    for _ in range(2):
        gui_app.process_block(block())
    h8 = gui_app.histories["coefficient_mask"]
    assert h8 is not h16
    assert h8.get_unraveled().shape[1] == 8
    # the 16-atom history survived untouched
    assert gui_app.mask_histories[16] is h16
    assert h16.num_values == filled_16

    gui_app.set_dictionary(size=16)
    assert gui_app.histories["coefficient_mask"] is h16


def test_figure_view_tracks_dictionary_switch(gui_app):
    view, fig, _ = _make_view(gui_app)
    rng = np.random.default_rng(11)
    block = lambda: rng.standard_normal((2, gui_app.config.block_size)).astype(
        np.float32
    ) * 0.1
    gui_app.process_block(block())
    view.refresh()
    assert np.asarray(view._images["dict"].get_array()).shape[1] == 16
    gui_app.set_dictionary(size=8)
    gui_app.process_block(block())
    view.refresh()
    assert np.asarray(view._images["dict"].get_array()).shape[1] == 8
    # mask waterfall is drawn transposed: rows = atoms of the new size
    assert np.asarray(view._images["mask"].get_array()).shape[0] == 8


# ---------------------------------------------------- Tk shell (stubbed Tk)


class _RecordingStream:
    """Mock live-output sink: records every enhanced block the pump plays
    (stands in for CallbackOutputStream in GUI tests)."""

    def __init__(self):
        self.blocks: list[np.ndarray] = []
        self.closed = False

    def write(self, block):
        self.blocks.append(np.asarray(block, np.float32).copy())
        return True

    def close(self):
        self.closed = True


def _make_window(gui_app, loop=False, output_stream=None):
    import tests.fake_tk as fake_tk
    from gccnmf_tpu.gui import RealtimeGCCNMFWindow

    stream = output_stream if output_stream is not None else _RecordingStream()
    win = RealtimeGCCNMFWindow(
        gui_app,
        loop=loop,
        tk_module=fake_tk,
        canvas_factory=fake_tk.FakeCanvasTkAgg,
        output_stream=stream,
    )
    return win, stream


def _wait_until(predicate, timeout_s=10.0):
    import time

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout_s:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_stub_window_builds_and_refreshes(gui_app):
    """The full widget wiring executes headlessly: every control exists,
    the refresh timer is armed, and one timer tick repaints the view."""
    win, _ = _make_window(gui_app)
    try:
        assert win.play_btn.options["text"] == "Play"
        for w in (win.s_center, win.s_width, win.s_shape, win.s_floor):
            assert w.packed and "command" in w.options
        assert win.root.after_calls, "refresh timer must be armed"
        rng = np.random.default_rng(2)
        for _ in range(2):
            gui_app.process_block(
                rng.standard_normal((2, gui_app.config.block_size)).astype(
                    np.float32
                )
                * 0.1
            )
        win.root.run_after_callbacks()  # fires _refresh, re-arms the timer
        assert win.root.after_calls
        assert "in" in win.view._images
    finally:
        win.close()
    assert win.root.destroyed


def test_stub_window_toggle_play_restart_logic(gui_app):
    """Play → Pause → resume → natural end-of-file → restart: the
    reference-parity state machine around the pump worker
    (VERDICT r2 item 6: this logic used to be display-gated)."""
    win, stream = _make_window(gui_app, loop=False)
    try:
        win.toggle_play()
        assert win.play_btn.options["text"] == "Pause"
        worker = win._worker
        assert worker is not None and worker.is_alive()
        # pause: worker stays alive but blocks on the event
        win.toggle_play()
        assert win.play_btn.options["text"] == "Play"
        assert not win._playing.is_set()
        # resume
        win.toggle_play()
        assert win._playing.is_set()
        # loop=False: the file ends and the worker dies on its own
        assert _wait_until(lambda: not worker.is_alive(), timeout_s=60.0)
        # a dead worker must be restartable, not a stuck Pause button
        win.toggle_play()
        assert win._worker is not worker and win._worker.is_alive()
        assert win.play_btn.options["text"] == "Pause"
    finally:
        win.close()


def test_stub_window_pump_plays_enhanced_blocks(gui_app):
    """The pump must route every enhanced block into the live output
    stream — the reference demo's entire point (audioProcessor.py:106-132).
    Round 2 discarded process_block's return value here."""
    win, stream = _make_window(gui_app, loop=True)
    try:
        win.toggle_play()
        assert _wait_until(lambda: len(stream.blocks) >= 4, timeout_s=60.0)
    finally:
        win.close()
    bs = gui_app.config.block_size
    for b in stream.blocks:
        assert b.shape == (2, bs)
        assert np.isfinite(b).all()
    assert stream.closed, "close path must close the output stream"


def test_stub_window_pump_error_surfaces_on_status_line(gui_app, tmp_path):
    """A doomed pump (mono input) must surface its error on the status
    line and reset the Play button — not die silently on a logger most
    GUI sessions never see, leaving a frozen 'Pause' UI."""
    from gccnmf_tpu.utils import wav as wavio

    mono = str(tmp_path / "mono.wav")
    wavio.write_wav(np.zeros((1, 8192), np.float32) + 0.01, mono, 16000)
    gui_app.audio_path = mono
    win, _ = _make_window(gui_app)
    try:
        win.toggle_play()
        assert _wait_until(
            lambda: win._pump_error is not None
            and not win._worker.is_alive(),
            timeout_s=30.0,
        )
        win.root.run_after_callbacks()  # 100 ms tick renders the error
        assert "channel" in win.status_var.get()
        assert win.play_btn.options["text"] == "Play"  # not a stuck Pause
    finally:
        win.close()


def test_stub_window_status_line_shows_live_health(gui_app):
    """The status line must surface the pump's health counters — block
    count, processing times, deadline misses, and the output stream's
    underrun/overrun tallies (VERDICT r3 item 8: run()/serving count
    these but the GUI used to discard them; reference analogue is the
    2 s processing-time log, audioProcessor.py:98-102)."""
    win, stream = _make_window(gui_app, loop=True)
    try:
        assert win.status_var.get() == "idle"  # nothing processed yet
        win.toggle_play()
        assert _wait_until(lambda: win.blocks_processed >= 3, timeout_s=60.0)
        win._playing.clear()  # pause so the assertion text is stable
        stream.underruns = 2  # simulate device-clock starvation
        win.root.run_after_callbacks()  # 100 ms tick → _update_status
        text = win.status_var.get()
        assert "blocks" in text and "proc" in text
        assert "deadline misses" in text
        assert "underruns 2" in text and "overruns" in text
        # round 5: the host-memory watchdog rides the same line (the
        # tunnel transport's staging retention grows for the process
        # lifetime — docs/tunnel_probe.json)
        assert " | mem " in text and "MiB" in text
        assert "RECYCLE" not in text  # far under the 6 GiB budget here
        n = win.blocks_processed
        assert f"blocks {n}" in text
        assert win.deadline_misses <= n
    finally:
        win.close()


def test_stub_window_callbacks_reach_the_app(gui_app):
    """Spinbox/dropdown/slider/keyboard callbacks drive the app exactly as
    the displayed window would."""
    win, _ = _make_window(gui_app)
    try:
        # dictionary-size dropdown → structural rebuild
        dict_menu = next(
            w for w in _walk(win.root) if w.__class__.__name__ == "OptionMenu"
            and getattr(w, "variable", None) is win.dict_var
        )
        dict_menu.select("8")
        assert win.app.dictionary_size == 8
        # H-updates spinbox → set_num_h_updates
        h_spin = next(
            w for w in _walk(win.root) if w.__class__.__name__ == "Spinbox"
            and w.options.get("textvariable") is win.h_var
        )
        h_spin.set_and_fire(2)
        assert win.app.config.num_h_updates == 2
        # center slider drag → hot params (no rebuild)
        win.s_center.drag_to(20.0)
        assert float(np.asarray(win.app.params.target_tdoa_index)) == (
            pytest.approx(20.0, abs=0.5)
        )
        # keyboard shortcuts are bound; space toggles playback
        assert "<space>" in win.root.bindings
        win.root.bindings["<space>"](None)
        assert win._worker is not None and win._worker.is_alive()
        win.root.bindings["<space>"](None)  # pause again
        assert not win._playing.is_set()
        # localization checkbox greys out the center slider
        win.loc_var.set(True)
        win._set_localization(True)
        assert win.s_center.options.get("state") == "disabled"
        win._set_localization(False)
        assert win.s_center.options.get("state") == "normal"
    finally:
        win.close()


def _walk(widget):
    yield widget
    for child in widget.children:
        yield from _walk(child)


def test_stub_window_close_is_idempotent_from_protocol(gui_app):
    """WM_DELETE_WINDOW runs the same close path the X button uses."""
    win, stream = _make_window(gui_app)
    win.toggle_play()
    closer = win.root.protocols["WM_DELETE_WINDOW"]
    closer()
    assert win.root.destroyed
    assert stream.closed
    assert win._stop.is_set()
    assert not win._worker.is_alive()


# ------------------------------------------------------------------ Tk shell


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
    from gccnmf_tpu.realtime.audio import FilePlayerSource

    src = FilePlayerSource(path, app.config.block_size)
    for i, block in enumerate(src.blocks()):
        app.process_block(block)
        if i >= 3:
            break
    win.root.update()
    win._refresh()
    # slider → region → slider round trip through the Tk widgets
    win.s_center.set(20.0)
    win._slider_edit(tdoa=20.0)
    assert win.view.model.tdoa == pytest.approx(20.0, abs=0.5)
    win.close()
