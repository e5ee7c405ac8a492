"""Tests for the realtime runtime (buffers, audio sources, app shell),
viz helpers, and NMF checkpointing."""

import logging
import os

import numpy as np
import pytest

from gccnmf_tpu.realtime.buffers import CircularBuffer


class TestCircularBuffer:
    def test_append_and_get(self):
        buf = CircularBuffer(3, size=4)
        buf.set(np.array([1.0, 1, 1]))
        buf.set(np.array([2.0, 2, 2]))
        assert buf.num_values == 2
        got = buf.get()
        np.testing.assert_array_equal(got[:, 0], [1, 2])

    def test_wraparound(self):
        buf = CircularBuffer((), size=3)
        for i in range(5):
            buf.set(np.float32(i))
        np.testing.assert_array_equal(buf.get(), [2, 3, 4])
        np.testing.assert_array_equal(buf.get_unraveled(), [2, 3, 4])

    def test_batch_append(self):
        buf = CircularBuffer(2, size=4)
        buf.set(np.arange(6, dtype=np.float32).reshape(3, 2))
        buf.set(np.arange(10, 14, dtype=np.float32).reshape(2, 2))
        got = buf.get(3)
        np.testing.assert_array_equal(got[-1], [12, 13])
        assert buf.num_values == 4

    def test_oversize_batch(self):
        buf = CircularBuffer((), size=3)
        buf.set(np.arange(7, dtype=np.float32))
        np.testing.assert_array_equal(buf.get(), [4, 5, 6])

    def test_get_unraveled_includes_zeros(self):
        buf = CircularBuffer((), size=4)
        buf.set(np.float32(9))
        unr = buf.get_unraveled()
        assert unr.shape == (4,)
        assert unr[-1] == 9 and unr[0] == 0


class TestAudio:
    def test_file_player_blocks(self, tmp_path, stereo_signal):
        from gccnmf_tpu.realtime.audio import FilePlayerSource
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "a.wav")
        wavio.write_wav(mix, path, sr)
        src = FilePlayerSource(path, block_size=512)
        blocks = list(src.blocks())
        assert len(blocks) == mix.shape[-1] // 512
        assert blocks[0].shape == (2, 512)
        rebuilt = np.concatenate(blocks, axis=-1)
        np.testing.assert_allclose(
            rebuilt, mix[:, : rebuilt.shape[-1]], atol=2e-4
        )

    def test_file_player_loop(self, tmp_path, stereo_signal):
        from gccnmf_tpu.realtime.audio import FilePlayerSource
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "a.wav")
        wavio.write_wav(mix[:, : 512 * 3], path, sr)
        src = FilePlayerSource(path, block_size=512, loop=True)
        it = src.blocks()
        got = [next(it) for _ in range(7)]  # wraps past 3-block file twice
        np.testing.assert_allclose(got[0], got[3], atol=1e-7)

    def test_wav_sink(self, tmp_path):
        from gccnmf_tpu.realtime.audio import WavSink
        from gccnmf_tpu.utils import wav as wavio

        sink = WavSink(str(tmp_path / "o.wav"), 16000)
        sink.write(np.ones((2, 512), np.float32) * 0.5)
        sink.write(np.ones((2, 512), np.float32) * -0.5)
        path = sink.close()
        out, sr = wavio.read_wav(path)
        assert out.shape == (2, 1024) and sr == 16000

    def test_file_player_rejects_sub_block_file(self, tmp_path):
        """A file shorter than one block would loop as undersized blocks
        forever; it must be rejected up front."""
        from gccnmf_tpu.realtime.audio import FilePlayerSource
        from gccnmf_tpu.utils import wav as wavio

        path = str(tmp_path / "short.wav")
        wavio.write_wav(np.zeros((2, 300), np.float32), path, 16000)
        with pytest.raises(ValueError, match="shorter than"):
            FilePlayerSource(path, block_size=512, loop=True)

    def test_live_ring_rejects_wrong_shape_push(self):
        """A wrong-shaped push would permanently desync the consumer's
        fixed-size channel framing."""
        from gccnmf_tpu.realtime.audio import LiveRingSource

        src = LiveRingSource(num_channels=2, block_size=512)
        with pytest.raises(ValueError, match="push_planar expects"):
            src.push_planar(np.zeros(512, np.float32))  # mono
        with pytest.raises(ValueError, match="push_planar expects"):
            src.push_planar(np.zeros((2, 256), np.float32))  # half block
        assert src.push_planar(np.zeros((2, 512), np.float32))
        assert src.overruns == 0


class TestRealtimeApp:
    @pytest.fixture()
    def app(self, tmp_path, stereo_signal):
        from gccnmf_tpu.config import load_config
        from gccnmf_tpu.realtime.app import RealtimeGCCNMF
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "mix.wav")
        wavio.write_wav(mix, path, sr)
        rng = np.random.default_rng(0)
        w16 = rng.random((513, 16)).astype(np.float32) + 1e-3
        w8 = rng.random((513, 8)).astype(np.float32) + 1e-3
        cfg = load_config(None, dictionary_size=16, dictionary_sizes=(8, 16))
        return RealtimeGCCNMF(
            path,
            config=cfg,
            dictionaries={"Pretrained": {16: w16, 8: w8}},
        )

    def test_run_headless(self, app, tmp_path):
        out = str(tmp_path / "enh.wav")
        stats = app.run(output_path=out, num_blocks=12)
        assert stats["blocks"] == 12
        assert os.path.exists(stats["output"])
        assert stats["deadline_ms"] == pytest.approx(32.0)
        # histories were populated
        assert app.histories["gcc_phat"].num_values > 0
        assert app.histories["input_spectrogram"].num_values > 0

    def test_hot_param_update_no_rebuild(self, app):
        app.run(num_blocks=2)
        proc_before = app.processor
        app.set_target_window(target_tdoa_index=10.0, epsilon=3.0)
        app.set_separation_enabled(False)
        app.set_localization(False)
        app.run(num_blocks=2)
        assert app.processor is proc_before  # fast path: same engine

    def test_dictionary_change_rebuilds(self, app):
        app.run(num_blocks=2)
        proc_before = app.processor
        app.set_dictionary(size=8)
        app.run(num_blocks=2)
        assert app.processor is not proc_before
        assert app.processor.w.shape[1] == 8
        assert app.histories["coefficient_mask"]._values.shape[1] == 8

    def test_dictionary_change_concurrent_with_blocks(self, app):
        """set_dictionary from a GUI thread must not race the audio thread's
        process_block: the engine lock makes structural swaps atomic, so a
        mid-stream swap can never feed step() a half-rebuilt engine."""
        import threading

        block = np.zeros((2, app.config.block_size), np.float32)
        app.process_block(block)  # build the first engine
        errors = []

        def pump():
            try:
                for _ in range(30):
                    out = app.process_block(block)
                    assert out.shape == (2, app.config.block_size)
            except Exception as e:  # pragma: no cover - the regression
                errors.append(e)

        t = threading.Thread(target=pump)
        t.start()
        for size in (8, 16, 8, 16):
            app.set_dictionary(size=size)
        t.join()
        assert not errors, errors

    def test_full_reconfig_storm_concurrent_with_blocks_and_gui_reads(self, app):
        """Three-way contention mirroring the real window: the audio thread
        pumps blocks, a control thread fires every structural reconfig
        surface, and a GUI-style thread drains telemetry and peeks the
        dictionary on a timer. No exceptions, finite outputs, no deadlock."""
        import threading

        block = np.zeros((2, app.config.block_size), np.float32)
        app.process_block(block)
        errors = []
        stop = threading.Event()

        def pump():
            try:
                for _ in range(40):
                    out = app.process_block(block)
                    assert out is not None and np.isfinite(out).all()
            except Exception as e:
                errors.append(e)
            finally:
                stop.set()

        def gui_reads():
            try:
                while not stop.is_set():
                    h = app.histories  # drains telemetry under the lock
                    h["gcc_phat"].get_unraveled()
                    h["coefficient_mask"].get_unraveled()
                    app.peek_dictionary()
            except Exception as e:
                errors.append(e)

        threads = [
            threading.Thread(target=pump),
            threading.Thread(target=gui_reads),
        ]
        for t in threads:
            t.start()
        try:
            app.set_num_tdoas(48)
            app.set_dictionary(size=8)
            app.set_mic_separation(0.2)
            app.set_num_h_updates(2)
            app.set_target_mode("boxcar")
            app.set_dictionary(size=16)
            app.set_num_h_updates(0)
            app.set_target_mode("window")
        except Exception as e:
            errors.append(e)
        for t in threads:
            t.join(timeout=120)
            assert not t.is_alive(), "thread deadlocked"
        assert not errors, errors
        # the storm settled on a consistent engine
        out = app.process_block(block)
        assert out.shape == (2, app.config.block_size)
        assert app.config.num_tdoas == 48 and app.dictionary_size == 16

    def test_dictionary_file_size_mismatch_syncs_telemetry(
        self, tmp_path, stereo_signal
    ):
        """An artifact whose atom count differs from cfg.dictionary_size
        must resize the coefficient-mask history to the artifact's K —
        otherwise the first histories drain raises a broadcast error."""
        from gccnmf_tpu.config import load_config
        from gccnmf_tpu.realtime.app import RealtimeGCCNMF
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "mix.wav")
        wavio.write_wav(mix, path, sr)
        rng = np.random.default_rng(0)
        np.save(tmp_path / "W_24.npy", rng.random((513, 24)).astype(np.float32))
        cfg = load_config(
            None, dictionary_size=16,  # deliberately != the artifact's 24
            dictionary_file=str(tmp_path / "W_24.npy"),
        )
        app = RealtimeGCCNMF(path, config=cfg)
        app.run(num_blocks=4)
        masks = app.histories["coefficient_mask"]
        assert masks._values.shape[1] == 24
        assert masks.num_values > 0
        assert app.dictionary_size == 24

    def test_block_time_logging(self, app, caplog):
        import gccnmf_tpu.realtime.app as app_mod

        app_mod_interval = app_mod._TELEMETRY_LOG_INTERVAL_S
        try:
            app_mod._TELEMETRY_LOG_INTERVAL_S = 0.0
            with caplog.at_level(logging.INFO, logger="gccnmf_tpu.realtime.app"):
                app.run(num_blocks=3)
            assert any("processing times" in r.message for r in caplog.records)
        finally:
            app_mod._TELEMETRY_LOG_INTERVAL_S = app_mod_interval


class TestViz:
    def test_plots_render(self, stereo_signal, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        from gccnmf_tpu import viz

        mix, sr = stereo_signal
        rng = np.random.default_rng(0)
        spec = rng.random((50, 513)).astype(np.float32)
        ang = rng.random((50, 64)).astype(np.float32)
        w = rng.random((513, 16)).astype(np.float32)
        h = rng.random((50, 16)).astype(np.float32)

        viz.plot_waveform(mix, sr)
        plt.close("all")
        viz.plot_spectrogram(spec, sr, 512)
        plt.close("all")
        viz.plot_angular_spectrogram(ang, sr, 512)
        plt.close("all")
        viz.plot_localization(ang.mean(0), target_indexes=[10, 40])
        plt.close("all")
        fig = viz.plot_nmf_decomposition(w, h)
        fig.savefig(str(tmp_path / "nmf.png"))
        plt.close("all")
        masks = (rng.random((2, 50, 16)) > 0.5).astype(np.float32)
        viz.plot_coefficient_masks(masks)
        plt.close("all")

    def test_describe_printers(self, stereo_signal, capsys):
        from gccnmf_tpu import viz

        mix, sr = stereo_signal
        viz.describe_mixture_signal(mix, sr)
        viz.describe_spectrogram(np.zeros((10, 513), np.complex64), 1024, 512)
        w = np.ones((513, 4), np.float32)
        w /= np.linalg.norm(w, axis=0)
        viz.describe_nmf(w, np.ones((10, 4)))
        out = capsys.readouterr().out
        assert "mixture:" in out and "spectrogram:" in out and "NMF:" in out


class TestCheckpoint:
    def _problem(self):
        rng = np.random.default_rng(3)
        v = (rng.random((40, 33)) + 0.05).astype(np.float32)
        from gccnmf_tpu.ops import nmf as nmf_ops

        w0, h0 = nmf_ops.nmf_init_numpy(33, 8, 40)
        return v, w0, h0

    def test_checkpointed_matches_straight_run(self, tmp_path):
        from gccnmf_tpu import checkpoint
        from gccnmf_tpu.ops import nmf as nmf_ops

        v, w0, h0 = self._problem()
        w_ref, h_ref = nmf_ops.kl_nmf(v, w0, h0, 20)
        w_ck, h_ck = checkpoint.kl_nmf_checkpointed(
            v, w0, h0, 20, str(tmp_path / "ck"), checkpoint_every=7
        )
        np.testing.assert_allclose(np.asarray(w_ck), np.asarray(w_ref), rtol=2e-4)

    def test_resume_after_interruption(self, tmp_path):
        from gccnmf_tpu import checkpoint

        v, w0, h0 = self._problem()
        ck = str(tmp_path / "ck")
        # "interrupted" run: only 10 of 20 iterations
        checkpoint.kl_nmf_checkpointed(v, w0, h0, 10, ck, checkpoint_every=5)
        w10, h10, it = checkpoint.load_nmf_state(checkpoint.latest_checkpoint(ck))
        assert it == 10
        # resume toward a HIGHER target in the same dir: continues from 10
        checkpoint.kl_nmf_checkpointed(v, w0, h0, 20, ck, checkpoint_every=5)
        files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
        assert files == [
            "nmf_000005.npz", "nmf_000010.npz",
            "nmf_000015.npz", "nmf_000020.npz",
        ]
        w_final1, _, _ = checkpoint.load_nmf_state(os.path.join(ck, "nmf_000020.npz"))
        # rerunning the finished job is a no-op (resumes at 20, loop exits)
        w_re, _ = checkpoint.kl_nmf_checkpointed(
            v, w0, h0, 20, ck, checkpoint_every=5
        )
        np.testing.assert_array_equal(np.asarray(w_re), w_final1)

    def test_resume_past_target_raises(self, tmp_path):
        """A checkpoint beyond the requested iteration count must raise —
        silently returning the 20-iteration state as 'the requested 10'
        would corrupt any comparison across iteration counts."""
        from gccnmf_tpu import checkpoint

        v, w0, h0 = self._problem()
        ck = str(tmp_path / "ck")
        checkpoint.kl_nmf_checkpointed(v, w0, h0, 20, ck, checkpoint_every=5)
        with pytest.raises(ValueError, match="past"):
            checkpoint.kl_nmf_checkpointed(v, w0, h0, 10, ck, checkpoint_every=5)
        # the exact-target rerun stays a no-op (start == num_iterations)
        checkpoint.kl_nmf_checkpointed(v, w0, h0, 20, ck, checkpoint_every=5)

    def test_mismatched_meta_rejected(self, tmp_path):
        from gccnmf_tpu import checkpoint

        v, w0, h0 = self._problem()
        ck = str(tmp_path / "ck")
        checkpoint.kl_nmf_checkpointed(v, w0, h0, 5, ck, checkpoint_every=5)
        path = checkpoint.latest_checkpoint(ck)
        with pytest.raises(ValueError, match="different problem"):
            checkpoint.load_nmf_state(
                path, expect_meta=dict(sparsity_alpha=0.5, v_shape=[40, 33])
            )


class TestPipelinedApp:
    def _make_app(self, tmp_path, stereo_signal, depth):
        from gccnmf_tpu.config import load_config
        from gccnmf_tpu.realtime.app import RealtimeGCCNMF
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "mix.wav")
        wavio.write_wav(mix, path, sr)
        rng = np.random.default_rng(0)
        w = rng.random((513, 16)).astype(np.float32) + 1e-3
        cfg = load_config(None, dictionary_size=16)
        return RealtimeGCCNMF(
            path, config=cfg, dictionaries={"Pretrained": {16: w}},
            pipeline_depth=depth,
        )

    def test_pipelined_output_file_identical(self, tmp_path, stereo_signal):
        """Dispatch pipelining shifts WHEN outputs surface, never WHAT they
        are: the written file must be bit-identical to an unpipelined run."""
        from gccnmf_tpu.utils import wav as wavio

        out0 = str(tmp_path / "o0.wav")
        out2 = str(tmp_path / "o2.wav")
        app0 = self._make_app(tmp_path, stereo_signal, depth=0)
        app2 = self._make_app(tmp_path, stereo_signal, depth=2)
        s0 = app0.run(output_path=out0, num_blocks=10)
        s2 = app2.run(output_path=out2, num_blocks=10)
        assert s0["blocks"] == s2["blocks"] == 10
        a, _ = wavio.read_wav(out0)
        b, _ = wavio.read_wav(out2)
        np.testing.assert_array_equal(a, b)

    def test_process_block_contract(self, tmp_path, stereo_signal):
        app = self._make_app(tmp_path, stereo_signal, depth=1)
        block = np.zeros((2, app.config.block_size), np.float32)
        assert app.process_block(block) is None  # pipeline filling
        out = app.process_block(block)
        assert out is not None and out.shape == (2, app.config.block_size)
        tail = app.flush()
        assert len(tail) == 1 and tail[0].shape == (2, app.config.block_size)
        assert app.flush() == []

    def test_negative_depth_rejected(self, tmp_path, stereo_signal):
        with pytest.raises(ValueError, match="pipeline_depth"):
            self._make_app(tmp_path, stereo_signal, depth=-1)


class TestStructuralReconfig:
    """Mid-stream structural changes (reference structural-reset list,
    gccNMFProcessor.py:127-157): each rebuild must preserve the audio-path
    state so the output stream has no gap beyond one block."""

    def _app(self, tmp_path, depth=0):
        from gccnmf_tpu.config import load_config
        from gccnmf_tpu.realtime.app import RealtimeGCCNMF
        from gccnmf_tpu.utils import wav as wavio

        sr = 16000
        t = np.arange(sr * 2) / sr
        tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mix = np.stack([tone, tone])
        path = str(tmp_path / "tone.wav")
        wavio.write_wav(mix, path, sr)
        rng = np.random.default_rng(0)
        w = rng.random((513, 16)).astype(np.float32) + 1e-3
        cfg = load_config(None, dictionary_size=16)
        app = RealtimeGCCNMF(
            path, config=cfg, dictionaries={"Pretrained": {16: w}},
            pipeline_depth=depth,
        )
        app.set_separation_enabled(False)  # passthrough: OLA gaps show as RMS dips
        return app, mix

    @staticmethod
    def _rms(x):
        return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))

    def _stream_with_change(self, app, mix, change, blocks=14, change_at=7):
        bs = app.config.block_size
        outs = []
        for i in range(blocks):
            if i == change_at:
                change(app)
            block = mix[:, i * bs : (i + 1) * bs]
            outs.append(app.process_block(block))
        return outs

    def _assert_continuous(self, outs, change_at=7):
        # skip the initial OLA windup; every block after the change except
        # at most one transition block must keep full tone energy
        steady = self._rms(outs[change_at - 1])
        dips = [
            i for i in range(change_at, len(outs))
            if self._rms(outs[i]) < steady * 0.7
        ]
        assert len(dips) <= 1, f"audio gap after reconfig: dips at {dips}"

    def test_mic_separation_midstream(self, tmp_path):
        app, mix = self._app(tmp_path)
        outs = self._stream_with_change(
            app, mix, lambda a: a.set_mic_separation(0.3)
        )
        assert app.processor.config.mic_separation_m == 0.3
        self._assert_continuous(outs)
        # localization state was reset (grid changed)
        assert app.histories["gcc_phat"].num_values > 0

    def test_num_tdoas_midstream(self, tmp_path):
        app, mix = self._app(tmp_path)
        outs = self._stream_with_change(app, mix, lambda a: a.set_num_tdoas(96))
        assert app.processor.config.num_tdoas == 96
        assert float(np.asarray(app.params.target_tdoa_index)) == 48.0
        self._assert_continuous(outs)
        h = app.histories["gcc_phat"]
        assert h._values.shape[1] == 96 and h.num_values > 0

    def test_target_mode_midstream(self, tmp_path):
        from gccnmf_tpu.models.realtime import TARGET_MODE_BOXCAR

        app, mix = self._app(tmp_path)
        outs = self._stream_with_change(
            app, mix, lambda a: a.set_target_mode("boxcar")
        )
        assert app.processor.config.target_mode == TARGET_MODE_BOXCAR
        self._assert_continuous(outs)

    def test_bad_geometry_rejected_before_commit(self, tmp_path):
        """Invalid structural geometry must be rejected at the setter (the
        caller's thread), not surface as an engine-rebuild exception on
        the audio thread at the next block — and the committed config must
        be untouched after the rejection."""
        app, mix = self._app(tmp_path)
        old = app.config
        with pytest.raises(ValueError, match="divide"):
            app.set_block_geometry(hop_size=384)  # 384 does not divide 512
        with pytest.raises(ValueError, match="exceed"):
            app.set_block_geometry(window_size=256, hop_size=512)
        assert app.config == old
        bs = app.config.block_size
        out = app.process_block(mix[:, :bs])  # engine still healthy
        assert out is None or np.isfinite(out).all()

    def test_block_geometry_midstream(self, tmp_path):
        app, mix = self._app(tmp_path)
        bs = app.config.block_size
        for i in range(4):
            app.process_block(mix[:, i * bs : (i + 1) * bs])
        app.set_block_geometry(window_size=512, hop_size=256)
        assert app.config.num_freq == 257
        # the old (513, K) bank was dropped; provide the new-F dictionary
        # directly (the production path would re-pretrain for F=257)
        assert app._dictionaries is None
        rng = np.random.default_rng(1)
        app._dictionaries = {
            "Pretrained": {16: rng.random((257, 16)).astype(np.float32) + 1e-3}
        }
        assert app.histories["input_spectrogram"]._values.shape[1] == 257
        out = app.process_block(mix[:, 4 * bs : 5 * bs])
        assert out.shape == (2, bs) and np.isfinite(out).all()

    def test_dictionary_swap_is_gap_free(self, tmp_path):
        from gccnmf_tpu.config import load_config
        from gccnmf_tpu.realtime.app import RealtimeGCCNMF
        from gccnmf_tpu.utils import wav as wavio

        sr = 16000
        t = np.arange(sr * 2) / sr
        tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mix = np.stack([tone, tone])
        path = str(tmp_path / "tone.wav")
        wavio.write_wav(mix, path, sr)
        rng = np.random.default_rng(0)
        dicts = {"Pretrained": {
            16: rng.random((513, 16)).astype(np.float32) + 1e-3,
            8: rng.random((513, 8)).astype(np.float32) + 1e-3,
        }}
        app = RealtimeGCCNMF(path, config=load_config(
            None, dictionary_size=16, dictionary_sizes=(8, 16)
        ), dictionaries=dicts)
        app.set_separation_enabled(False)
        outs = self._stream_with_change(
            app, mix, lambda a: a.set_dictionary(size=8)
        )
        # passthrough output is dictionary-independent: NO dip at all
        steady = self._rms(outs[6])
        for i in range(7, len(outs)):
            assert self._rms(outs[i]) > steady * 0.9, f"gap at block {i}"

    def test_invalid_target_mode_rejected(self, tmp_path):
        app, _ = self._app(tmp_path)
        with pytest.raises(ValueError, match="MULTIPLE"):
            app.set_target_mode("multiple")
        with pytest.raises(ValueError, match="unknown target mode"):
            app.set_target_mode("gaussian?")
