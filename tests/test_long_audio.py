"""Sequence-parallel long-audio separation vs the single-device pipeline.

Runs on the 8-device virtual CPU mesh (tests/conftest.py). The sharded
pipeline must reproduce the single-device separator: same localized
targets, same dictionary (up to psum reduction-order drift), waveforms
matching to high SNR across the ppermute-stitched shard seams.
"""

from dataclasses import replace

import numpy as np
import pytest

import jax

from gccnmf_tpu.metrics import snr
from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
from gccnmf_tpu.ops import stft as stft_ops
from gccnmf_tpu.parallel import mesh as mesh_lib
from gccnmf_tpu.parallel.long_audio import LongAudioSeparator


def _two_source_mix(num_frames, window=1024, hop=128, sr=16000, seed=0):
    """Stereo mixture whose STFT has exactly ``num_frames`` frames."""
    n = (num_frames - 1) * hop + window
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)

    def source(seed_, rate):
        g = np.random.default_rng(seed_)
        return g.standard_normal(n) * (0.5 + 0.5 * np.sin(2 * np.pi * rate * t))

    s1, s2 = source(1, 3.0), source(2, 7.0)
    d = 4
    left = s1 + np.roll(s2, d)
    right = np.roll(s1, d) + s2
    return (0.2 * np.stack([left, right])).astype(np.float32)


@pytest.fixture(scope="module")
def cfg():
    return OfflineConfig(
        num_iterations=30,
        dictionary_size=32,
        num_tdoas=64,
        num_sources=2,
        mic_separation_m=0.5,
    )


class TestLongAudioSeparator:
    def test_matches_single_device(self, cfg):
        stereo = _two_source_mix(8 * 40)  # 320 frames: 40 per shard
        single = GCCNMFSeparator(cfg).separate(stereo, num_sources=2)
        mesh = mesh_lib.data_parallel_mesh()
        assert mesh.shape["data"] == 8
        sharded = LongAudioSeparator(cfg, mesh).separate(stereo, num_sources=2)

        assert list(sharded["target_tdoa_indexes"]) == list(
            single["target_tdoa_indexes"]
        )
        # dictionary equal up to psum reduction-order drift
        np.testing.assert_allclose(
            sharded["w"], single["w"], rtol=5e-2, atol=1e-4
        )
        est_s, est_1 = sharded["estimates"], single["estimates"]
        assert est_s.shape == est_1.shape
        for i in range(est_1.shape[0]):
            s = snr(est_1[i], est_s[i])
            assert s > 40.0, f"target {i}: waveform SNR {s:.1f} dB across seams"

    def test_seam_continuity(self, cfg):
        """No discontinuity artifacts at shard boundaries: the stitched
        output's seam-neighborhood energy matches the single-device run."""
        stereo = _two_source_mix(8 * 32)
        single = GCCNMFSeparator(cfg).separate(stereo, num_sources=2)
        sharded = LongAudioSeparator(cfg).separate(stereo, num_sources=2)
        hop, window = cfg.hop_size, cfg.window_size
        t_s = 32  # frames per shard
        half = window // 2
        scale = float(np.abs(single["estimates"]).max())
        for b in range(1, 8):  # every shard boundary
            seam = b * t_s * hop - half  # boundary sample in trimmed output
            lo, hi = max(seam - window, 0), seam + window
            a = sharded["estimates"][:, :, lo:hi]
            r = single["estimates"][:, :, lo:hi]
            np.testing.assert_allclose(a, r, atol=2e-3 * scale)

    def test_trims_ragged_frames(self, cfg):
        """Frame counts that don't divide the mesh are trimmed, not fatal."""
        stereo = _two_source_mix(8 * 24 + 5)
        result = LongAudioSeparator(cfg).separate(stereo, num_sources=2)
        assert result["frames_processed"] == 8 * 24
        n_expected = 8 * 24 * cfg.hop_size + (cfg.window_size - cfg.hop_size)
        assert result["estimates"].shape[-1] == n_expected - cfg.window_size

    def test_too_short_raises(self, cfg):
        with pytest.raises(ValueError):
            LongAudioSeparator(cfg).separate(_two_source_mix(8), num_sources=2)

    def test_num_sources_defers_like_single_device(self, cfg):
        """num_sources=None must mirror GCCNMFSeparator.separate: defer to
        the config (and let config None mean auto counting), never coerce
        to a hardcoded 3."""
        stereo = _two_source_mix(8 * 24)
        result = LongAudioSeparator(cfg).separate(stereo)  # cfg says 2
        assert result["estimates"].shape[0] == 2
        auto_cfg = replace(cfg, num_sources=None)
        auto = LongAudioSeparator(auto_cfg).separate(stereo)
        want = GCCNMFSeparator(auto_cfg).separate(stereo)
        assert (
            auto["estimates"].shape[0]
            == np.asarray(want["estimates"]).shape[0]
        )
        assert list(auto["target_tdoa_indexes"]) == list(
            want["target_tdoa_indexes"]
        )

    def test_separate_file_roundtrip(self, cfg, tmp_path):
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(8 * 24)
        path = str(tmp_path / "long_mix.wav")
        wavio.write_wav(stereo, path, 16000)
        result = LongAudioSeparator(cfg).separate_file(path)
        assert len(result["paths"]) == 2
        for p in result["paths"]:
            x, sr = wavio.read_wav(p)
            assert np.isfinite(x).all() and x.shape[0] == 2

    def test_streamed_matches_in_memory(self, cfg, tmp_path):
        """Disk-streamed separation (mmap reader + make_array_from_callback
        + incremental writers) is waveform-identical to the in-memory path
        up to int16 quantization."""
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(8 * 24)
        path = str(tmp_path / "streamed_mix.wav")
        wavio.write_wav(stereo, path, 16000)
        # the fixture file is itself int16-quantized: the in-memory
        # reference must see the same samples the streamed reader sees
        stereo_q, _ = wavio.read_wav(path)

        sep = LongAudioSeparator(cfg)
        ref = sep.separate(stereo_q, num_sources=2)
        out = sep.separate_streamed(
            path, output_prefix=str(tmp_path / "streamed"), num_sources=2
        )
        assert list(out["target_tdoa_indexes"]) == list(
            ref["target_tdoa_indexes"]
        )
        assert len(out["paths"]) == ref["estimates"].shape[0]
        assert out["frames_processed"] == ref["frames_processed"]
        for i, p in enumerate(out["paths"]):
            got, sr = wavio.read_wav(p)
            want = ref["estimates"][i]
            assert sr == 16000
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=2.0 / 32768.0)

    def test_streamed_resamples_config_to_file_rate(self, cfg, tmp_path):
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(8 * 24)
        path = str(tmp_path / "sr8k_mix.wav")
        wavio.write_wav(stereo, path, 8000)
        out = LongAudioSeparator(cfg).separate_streamed(
            path, output_prefix=str(tmp_path / "sr8k")
        )
        _, sr = wavio.read_wav(out["paths"][0])
        assert sr == 8000

    def test_streamed_rejects_mono(self, cfg, tmp_path):
        from gccnmf_tpu.utils import wav as wavio

        mono = _two_source_mix(8 * 24)[:1]
        path = str(tmp_path / "mono.wav")
        wavio.write_wav(mono, path, 16000)
        with pytest.raises(ValueError, match="stereo"):
            LongAudioSeparator(cfg).separate_streamed(path)


@pytest.fixture
def mesh1():
    """A 1-device mesh: routes separate_streamed to the chunked driver."""
    return mesh_lib.make_mesh(data=1, model=1, devices=jax.devices()[:1])


class TestChunkedStreamed:
    """Single-device sequential macro-chunk streaming (the path the real
    chip takes — on one device the sharded program would embed hour-scale
    shapes in a single compile)."""

    @pytest.mark.parametrize("chunk_frames", [2, 64, 512])
    def test_matches_single_device_parity(
        self, cfg, mesh1, tmp_path, chunk_frames
    ):
        """f32-parity chunked streaming reproduces GCCNMFSeparator up to
        int16 output quantization — including the ragged final chunk
        (200 % 64 != 0), the single-chunk case (512 > 200), and chunks
        smaller than the half-window leading trim (2·hop < window/2, so
        the trim spans multiple chunks)."""
        from gccnmf_tpu.utils import wav as wavio

        cfg32 = replace(cfg, nmf_matmul_dtype="float32")
        stereo = _two_source_mix(200)
        path = str(tmp_path / f"chunked_{chunk_frames}.wav")
        wavio.write_wav(stereo, path, 16000)
        stereo_q, _ = wavio.read_wav(path)

        ref = GCCNMFSeparator(cfg32).separate(stereo_q, num_sources=2)
        sep = LongAudioSeparator(cfg32, mesh1, chunk_frames=chunk_frames)
        out = sep.separate_streamed(
            path,
            output_prefix=str(tmp_path / f"chk{chunk_frames}"),
            num_sources=2,
        )
        assert list(out["target_tdoa_indexes"]) == list(
            ref["target_tdoa_indexes"]
        )
        assert out["frames_processed"] == 200
        for i, p in enumerate(out["paths"]):
            got, sr = wavio.read_wav(p)
            want = ref["estimates"][i]
            assert sr == 16000 and got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=3.0 / 32768.0)

    def test_default_mode_quality(self, cfg, mesh1, tmp_path):
        """Throughput mode (bf16 plane storage): same localization, high
        waveform agreement with the f32 single-device pipeline."""
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(192)
        path = str(tmp_path / "chunked_bf16.wav")
        wavio.write_wav(stereo, path, 16000)
        stereo_q, _ = wavio.read_wav(path)

        ref = GCCNMFSeparator(cfg).separate(stereo_q, num_sources=2)
        out = LongAudioSeparator(cfg, mesh1, chunk_frames=64).separate_streamed(
            path, output_prefix=str(tmp_path / "bf16"), num_sources=2
        )
        assert list(out["target_tdoa_indexes"]) == list(
            ref["target_tdoa_indexes"]
        )
        for i, p in enumerate(out["paths"]):
            got, _ = wavio.read_wav(p)
            s = snr(ref["estimates"][i], got)
            assert s > 20.0, f"target {i}: SNR {s:.1f} dB vs f32 pipeline"

    def test_float_wav_input_falls_back_to_float_upload(
        self, cfg, mesh1, tmp_path
    ):
        """Non-int16 inputs (float WAVs) can't ship raw PCM; the driver
        must fall back to float32 uploads and still produce the same
        separation."""
        from scipy.io import wavfile as sp_wavfile

        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(150)
        path = str(tmp_path / "float_mix.wav")
        sp_wavfile.write(path, 16000, stereo.T)  # float32 payload
        assert wavio.WavReader(path).raw_dtype.kind == "f"

        out = LongAudioSeparator(cfg, mesh1, chunk_frames=64).separate_streamed(
            path, output_prefix=str(tmp_path / "fwav"), num_sources=2
        )
        assert len(out["paths"]) == 2
        for p in out["paths"]:
            x, _ = wavio.read_wav(p)
            assert np.isfinite(x).all() and np.abs(x).max() > 0

    def test_device_init_skips_upload_and_still_separates(
        self, cfg, mesh1, tmp_path
    ):
        """nmf_init='device' draws H0 on device (zero H0 upload — ~0.5 GB
        per audio hour through the ingest link otherwise): same
        localization as the reference-init run on this fixture, finite
        nonzero outputs, but a deliberately different NMF trajectory
        (never the parity path)."""
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(160)
        path = str(tmp_path / "devinit.wav")
        wavio.write_wav(stereo, path, 16000)

        ref = LongAudioSeparator(
            cfg, mesh1, chunk_frames=64
        ).separate_streamed(
            path, output_prefix=str(tmp_path / "ri"), num_sources=2
        )
        out = LongAudioSeparator(
            cfg, mesh1, chunk_frames=64, nmf_init="device"
        ).separate_streamed(
            path, output_prefix=str(tmp_path / "di"), num_sources=2
        )
        # localization is driven by GCC-PHAT, not the NMF init
        assert list(out["target_tdoa_indexes"]) == list(
            ref["target_tdoa_indexes"]
        )
        for p_ref, p_dev in zip(ref["paths"], out["paths"]):
            a, _ = wavio.read_wav(p_ref)
            b, _ = wavio.read_wav(p_dev)
            assert np.isfinite(b).all() and np.abs(b).max() > 0
            assert not np.array_equal(a, b)  # different trajectory

    def test_device_init_rejects_unknown_mode(self, cfg, mesh1):
        with pytest.raises(ValueError, match="nmf_init"):
            LongAudioSeparator(cfg, mesh1, nmf_init="magic")

    def test_device_init_on_sharded_mesh(self, cfg):
        """nmf_init='device' also covers the multi-shard (mesh) path —
        the H0 is drawn sharded on device instead of permuted on host."""
        stereo = _two_source_mix(192)
        ref = LongAudioSeparator(cfg).separate(stereo)
        out = LongAudioSeparator(cfg, nmf_init="device").separate(stereo)
        assert list(out["target_tdoa_indexes"]) == list(
            ref["target_tdoa_indexes"]
        )
        est = np.asarray(out["estimates"])
        assert np.isfinite(est).all() and np.abs(est).max() > 0
        assert not np.array_equal(est, np.asarray(ref["estimates"]))

    def test_digital_silence_does_not_nan_poison(self, cfg, mesh1, tmp_path):
        """Hour-scale recordings routinely contain digitally silent spans
        (dropouts, muted segments). Unguarded coherence (0/0) and NMF
        multiplicative updates (H row collapses to 0, then 0/0) would
        NaN-poison localization and every output sample; the long-audio
        drivers must guard and still separate the nonsilent content."""
        from gccnmf_tpu.utils import wav as wavio

        stereo = _two_source_mix(200)
        # silence several whole analysis windows in BOTH channels mid-file
        # (exact zeros, aligned so at least one frame is fully silent)
        stereo[:, 40 * 128 : 40 * 128 + 4 * 1024] = 0.0
        path = str(tmp_path / "silent_span.wav")
        wavio.write_wav(stereo, path, 16000)
        stereo_q, _ = wavio.read_wav(path)

        # sharded (8-device mesh) in-memory driver
        out = LongAudioSeparator(cfg).separate(stereo_q)
        assert np.isfinite(np.asarray(out["estimates"])).all()
        assert np.isfinite(out["mean_angular_spectrum"]).all()

        # single-device chunked streamed driver
        ch = LongAudioSeparator(cfg, mesh1, chunk_frames=64).separate_streamed(
            path, output_prefix=str(tmp_path / "sil"), num_sources=2
        )
        for p in ch["paths"]:
            got, _ = wavio.read_wav(p)
            assert np.isfinite(got).all() and np.abs(got).max() > 0

    def test_seeded_init_chunked_draw_is_exact(self, cfg, mesh1):
        """The atom-block H0 draw reproduces nmf_init_numpy's MT19937
        stream bit-for-bit."""
        from gccnmf_tpu.ops import nmf as nmf_ops

        sep = LongAudioSeparator(cfg, mesh1)
        t2 = 2 * 100
        w_ref, h_ref = nmf_ops.nmf_init_numpy(
            cfg.num_freq, cfg.dictionary_size, t2, cfg.epsilon
        )
        w_got, h_got = sep._h0_device_chunked(t2, atom_block=8)
        np.testing.assert_array_equal(w_got, w_ref)
        np.testing.assert_array_equal(np.asarray(h_got), h_ref)
