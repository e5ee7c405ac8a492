"""Interactive realtime GUI (tkinter + matplotlib).

Functional parity with the reference's Qt/pyqtgraph window
(reference: gccNMF/realtime/gccNMFInterface.py:40-529): rolling
input/output spectrograms, GCC-PHAT angular waterfall with the localized
TDOA track, dictionary image, coefficient-mask waterfall, mask-window
sliders (center/width/shape/floor → target TDOA/ε/β/noise floor), a
dictionary-size selector, localization and separation toggles, and
play/pause — rebuilt on tkinter + matplotlib because Qt/pyqtgraph are not
in this image.

Architecture mirrors the headless app exactly: a worker thread pumps
blocks through :class:`gccnmf_tpu.realtime.app.RealtimeGCCNMF` (device
compute); the GUI thread repaints from the app's host-side history ring
buffers on a timer. Reads are unsynchronized by design — the same
tearing-tolerant telemetry contract as the reference's shared-memory GUI
reads (gccNMFInterface.py:385-405). Parameter widgets call the app's hot
(`set_target_window`, toggles — no recompile) or structural
(`set_dictionary` — engine rebuild) control paths between blocks.
"""

from __future__ import annotations

import logging
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["RealtimeGCCNMFWindow", "run_gui"]

_REFRESH_MS = 100  # reference uses a 100 ms plot timer (gccNMFInterface.py:69)


class RealtimeGCCNMFWindow:
    """Tk window around a :class:`RealtimeGCCNMF` app instance."""

    def __init__(self, app, loop: bool = True):
        import tkinter as tk
        from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg
        from matplotlib.figure import Figure

        self.app = app
        self.loop = loop
        self._playing = threading.Event()
        self._stop = threading.Event()
        self._worker: threading.Thread | None = None

        self.root = tk.Tk()
        self.root.title("RT-GCC-NMF (TPU)")
        self.root.protocol("WM_DELETE_WINDOW", self.close)

        fig = Figure(figsize=(11, 7), dpi=90)
        grid = fig.add_gridspec(2, 3)
        self.ax_in = fig.add_subplot(grid[0, 0])
        self.ax_out = fig.add_subplot(grid[0, 1])
        self.ax_dict = fig.add_subplot(grid[0, 2])
        self.ax_gcc = fig.add_subplot(grid[1, 0])
        self.ax_curve = fig.add_subplot(grid[1, 1])
        self.ax_mask = fig.add_subplot(grid[1, 2])
        fig.set_tight_layout(True)
        self.fig = fig
        self.canvas = FigureCanvasTkAgg(fig, master=self.root)
        self.canvas.get_tk_widget().pack(side=tk.TOP, fill=tk.BOTH, expand=1)

        self._build_controls(tk)
        # keyboard shortcuts (reference gccNMFInterface.py keyboard handling):
        # space = play/pause, s = separation toggle, l = localization toggle
        self.root.bind("<space>", lambda _e: self.toggle_play())
        self.root.bind("s", lambda _e: self._toggle_check(self.sep_var,
                       lambda v: self.app.set_separation_enabled(v)))
        self.root.bind("l", lambda _e: self._toggle_check(self.loc_var,
                       lambda v: self.app.set_localization(v)))
        self._images = {}
        self.root.after(_REFRESH_MS, self._refresh)

    @staticmethod
    def _toggle_check(var, setter):
        var.set(not var.get())
        setter(var.get())

    # --------------------------------------------------------------- widgets

    def _build_controls(self, tk):
        cfg = self.app.config
        bar = tk.Frame(self.root)
        bar.pack(side=tk.BOTTOM, fill=tk.X)

        self.play_btn = tk.Button(bar, text="Play", command=self.toggle_play)
        self.play_btn.pack(side=tk.LEFT, padx=4)

        self.sep_var = tk.BooleanVar(value=True)
        tk.Checkbutton(
            bar, text="separation", variable=self.sep_var,
            command=lambda: self.app.set_separation_enabled(self.sep_var.get()),
        ).pack(side=tk.LEFT)

        self.loc_var = tk.BooleanVar(value=bool(cfg.localization_enabled))
        tk.Checkbutton(
            bar, text="localization", variable=self.loc_var,
            command=lambda: self.app.set_localization(self.loc_var.get()),
        ).pack(side=tk.LEFT)

        def slider(name, frm, to, init, cmd, resolution=0.1):
            tk.Label(bar, text=name).pack(side=tk.LEFT, padx=(8, 0))
            s = tk.Scale(
                bar, from_=frm, to=to, resolution=resolution,
                orient=tk.HORIZONTAL, length=110, showvalue=True,
            )
            s.set(init)
            s.configure(command=lambda _v: cmd(float(s.get())))
            s.pack(side=tk.LEFT)
            return s

        # mask-window sliders: center/width/shape/floor
        # (reference TargetWindowFunctionPlot, gccNMFInterface.py:534-578)
        self.s_center = slider(
            "center", 0, cfg.num_tdoas - 1,
            float(np.asarray(self.app.params.target_tdoa_index)),
            lambda v: self.app.set_target_window(target_tdoa_index=v),
        )
        self.s_width = slider(
            "width", 0.5, cfg.num_tdoas / 2.0,
            float(np.asarray(self.app.params.target_epsilon)),
            lambda v: self.app.set_target_window(epsilon=v),
        )
        self.s_shape = slider(
            "shape", 0.25, 8.0, float(np.asarray(self.app.params.target_beta)),
            lambda v: self.app.set_target_window(beta=v),
        )
        self.s_floor = slider(
            "floor", 0.0, 1.0, float(np.asarray(self.app.params.noise_floor)),
            lambda v: self.app.set_target_window(noise_floor=v), resolution=0.01,
        )

        tk.Label(bar, text="dict").pack(side=tk.LEFT, padx=(8, 0))
        self.dict_var = tk.StringVar(value=str(self.app.dictionary_size))
        tk.OptionMenu(
            bar, self.dict_var,
            *[str(s) for s in cfg.dictionary_sizes],
            command=lambda v: self.app.set_dictionary(size=int(v)),
        ).pack(side=tk.LEFT)

    # ----------------------------------------------------------------- audio

    def _pump(self):
        from gccnmf_tpu.realtime.audio import FilePlayerSource

        cfg = self.app.config
        source = FilePlayerSource(
            self.app.audio_path, cfg.block_size, loop=self.loop, realtime=True
        )
        for block in source.blocks():
            if self._stop.is_set():
                return
            self._playing.wait()
            if self._stop.is_set():
                return
            self.app.process_block(block)

    def toggle_play(self):
        # a dead worker (file ended with loop=False, or the pump died)
        # must be restartable, not a permanently stuck "Pause" button
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(target=self._pump, daemon=True)
            self._playing.set()
            self._worker.start()
            self.play_btn.configure(text="Pause")
        elif self._playing.is_set():
            self._playing.clear()
            self.play_btn.configure(text="Play")
        else:
            self._playing.set()
            self.play_btn.configure(text="Pause")

    # ------------------------------------------------------------------ draw

    def _imshow(self, ax, key, data, cmap="magma", title=None):
        if key not in self._images:
            ax.clear()
            self._images[key] = ax.imshow(
                data, origin="lower", aspect="auto", cmap=cmap
            )
            if title:
                ax.set_title(title, fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
        else:
            img = self._images[key]
            if img.get_array().shape != data.shape:
                del self._images[key]
                return self._imshow(ax, key, data, cmap, title)
            img.set_data(data)
            img.set_clim(float(data.min()), float(data.max()) + 1e-9)

    def _refresh(self):
        if self._stop.is_set():
            return
        h = self.app.histories
        compress = lambda x: np.power(np.abs(x), 1.0 / 3.0)
        self._imshow(
            self.ax_in, "in", compress(h["input_spectrogram"].get_unraveled().T),
            title="input spectrogram",
        )
        self._imshow(
            self.ax_out, "out", compress(h["output_spectrogram"].get_unraveled().T),
            title="output spectrogram",
        )
        self._imshow(
            self.ax_gcc, "gcc", h["gcc_phat"].get_unraveled().T,
            title="GCC-PHAT waterfall",
        )
        self._imshow(
            self.ax_mask, "mask", h["coefficient_mask"].get_unraveled().T,
            cmap="gray", title="coefficient mask",
        )
        try:
            w = np.asarray(self.app.processor.w)
            self._imshow(self.ax_dict, "dict", compress(w), title="dictionary W")
        except Exception:
            pass

        # mean GCC-PHAT curve + localized target marker
        self.ax_curve.clear()
        mean_gcc = h["gcc_phat"].get(
            int(np.asarray(self.app.params.localization_window))
        )
        if mean_gcc.size:
            curve = mean_gcc.mean(axis=0)
            self.ax_curve.plot(curve, linewidth=1.0)
            tdoa = h["tdoa"].get(1)
            if tdoa.size:
                ti = int(tdoa[-1])
                self.ax_curve.axvline(ti, color="r", linewidth=1.0)
            self.ax_curve.set_title("mean GCC-PHAT", fontsize=9)
            self.ax_curve.set_xticks([])

        self.canvas.draw_idle()
        self.root.after(_REFRESH_MS, self._refresh)

    # ------------------------------------------------------------- lifecycle

    def run(self):
        self.root.mainloop()

    def close(self):
        self._stop.set()
        self._playing.set()  # release a paused worker so it can exit
        if self._worker is not None:
            self._worker.join(timeout=2.0)
        self.root.destroy()


def run_gui(audio_path: str | None = None, config_path: str | None = None,
            loop: bool = True, config=None):
    """Build the app + window and enter the Tk main loop.

    ``config`` (a :class:`gccnmf_tpu.config.GCCNMFConfig`) takes precedence
    over ``config_path`` so CLI-built configs (e.g. carrying
    ``--dictionary-file``) reach the app intact."""
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    app = RealtimeGCCNMF(audio_path, config_path, config=config)
    win = RealtimeGCCNMFWindow(app, loop=loop)
    win.run()
