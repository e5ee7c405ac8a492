"""CLI and pretraining tests (run on the CPU test platform)."""

import json
import os

import numpy as np
import pytest

from gccnmf_tpu import pretrain
from gccnmf_tpu.utils import wav as wavio


@pytest.fixture()
def wav_file(tmp_path, stereo_signal):
    mix, sr = stereo_signal
    path = str(tmp_path / "case_mix.wav")
    wavio.write_wav(mix, path, sr)
    return path, sr


class TestPretrain:
    def test_corpus_from_wavs(self, wav_file):
        path, _ = wav_file
        corpus = pretrain.training_corpus_from_wavs([path], 1024, 512)
        assert corpus.ndim == 2 and corpus.shape[1] == 513
        assert corpus.dtype == np.float32
        assert np.all(corpus >= 0)

    def test_pretrain_and_cache(self, wav_file, tmp_path):
        path, _ = wav_file
        corpus = pretrain.training_corpus_from_wavs([path], 1024, 512)[:256]
        cache = str(tmp_path / "cache")
        w1 = pretrain.pretrain_dictionary(
            corpus, 16, num_iterations=5, cache_dir=cache
        )
        assert w1.shape == (513, 16)
        files = os.listdir(cache)
        assert len(files) == 1
        # second call loads from cache (same result, no retrain)
        w2 = pretrain.pretrain_dictionary(
            corpus, 16, num_iterations=5, cache_dir=cache
        )
        np.testing.assert_array_equal(w1, w2)

    def test_cache_keyed_by_corpus(self, wav_file, tmp_path):
        """Unlike the reference (keyed by size only), different corpora get
        different cache entries."""
        path, _ = wav_file
        corpus = pretrain.training_corpus_from_wavs([path], 1024, 512)[:256]
        cache = str(tmp_path / "cache")
        pretrain.pretrain_dictionary(corpus, 16, num_iterations=2, cache_dir=cache)
        pretrain.pretrain_dictionary(
            corpus * 2.0, 16, num_iterations=2, cache_dir=cache
        )
        assert len(os.listdir(cache)) == 2

    def test_get_dictionaries_banks(self, wav_file, tmp_path):
        path, _ = wav_file
        corpus = pretrain.training_corpus_from_wavs([path], 1024, 512)[:128]
        banks = pretrain.get_dictionaries(
            1024, sizes=(8, 16), train_v=corpus, cache_dir=str(tmp_path / "c")
        )
        assert set(banks) == {"Pretrained", "Random"}
        assert banks["Pretrained"][8].shape == (513, 8)
        assert banks["Random"][16].shape == (513, 16)
        # ordered by spectral centroid
        w = banks["Pretrained"][16]
        cents = (np.arange(513)[:, None] * w).sum(0) / w.sum(0)
        assert np.all(np.diff(cents) >= -1e-3)


class TestCLI:
    def test_fingerprint_covers_every_row(self):
        """Same-shape corpora that differ only BETWEEN the old stride
        points must map to different cache keys (a strided hash silently
        reused a stale dictionary)."""
        rng = np.random.default_rng(0)
        a = rng.random((2000, 64)).astype(np.float32)
        b = a.copy()
        b[1] += 1e-3  # row 1 is between 31-row stride points at this size
        assert pretrain._corpus_fingerprint(a) != pretrain._corpus_fingerprint(b)
        assert pretrain._corpus_fingerprint(a) == pretrain._corpus_fingerprint(
            a.copy()
        )

    def test_cache_publish_is_atomic(self, wav_file, tmp_path):
        """The cache artifact appears under its final name only complete
        (tmp + os.replace) — no torn .npy is ever visible to a concurrent
        reader."""
        path, _ = wav_file
        corpus = pretrain.training_corpus_from_wavs([path], 1024, 512)[:128]
        cache = str(tmp_path / "cache")
        pretrain.pretrain_dictionary(corpus, 8, num_iterations=2, cache_dir=cache)
        names = os.listdir(cache)
        assert len(names) == 1 and names[0].endswith(".npy")
        assert ".tmp" not in names[0]
        w = np.load(os.path.join(cache, names[0]))
        assert w.shape == (513, 8)

    def test_cli_rejects_mono_input_clearly(self, tmp_path):
        """Every CLI must fail a mono file with the actual problem
        (channel count), not an opaque jit shape error."""
        from gccnmf_tpu.cli import separate_main, stream_main

        mono = str(tmp_path / "mono_mix.wav")
        wavio.write_wav(np.zeros((1, 8192), np.float32) + 0.01, mono, 16000)
        with pytest.raises(SystemExit, match="stereo"):
            separate_main([mono, "--num-iterations", "2",
                           "--dictionary-size", "8", "--num-sources", "1"])
        with pytest.raises(SystemExit, match="stereo"):
            stream_main(["-i", mono, "-o", str(tmp_path / "o.wav"),
                         "--dictionary-file", "nonexistent.npy"])
        # the disk-streamed branch never loads the waveform up front, so
        # it must apply the same guard via the WAV header (ADVICE r4)
        with pytest.raises(SystemExit, match="stereo"):
            separate_main([mono, "--streamed", "--num-iterations", "2",
                           "--dictionary-size", "8", "--num-sources", "1"])

    def test_separate_cli(self, wav_file, tmp_path, capsys):
        from gccnmf_tpu import cli

        path, sr = wav_file
        rc = cli.separate_main(
            [
                path,
                "-o", str(tmp_path / "out"),
                "--num-sources", "2",
                "--dictionary-size", "16",
                "--num-iterations", "5",
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["outputs"]) == 2
        for p in info["outputs"]:
            assert os.path.exists(p)

    def test_separate_cli_streamed(self, wav_file, tmp_path, capsys):
        from gccnmf_tpu import cli

        path, sr = wav_file
        rc = cli.separate_main(
            [
                path,
                "-o", str(tmp_path / "st"),
                "--num-sources", "2",
                "--dictionary-size", "16",
                "--num-iterations", "5",
                "--time-shards", "2",
                "--streamed",
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["outputs"]) == 2
        for p in info["outputs"]:
            x, out_sr = wavio.read_wav(p)
            assert out_sr == sr and np.isfinite(x).all() and x.shape[0] == 2

    def test_separate_cli_turbo(self, wav_file, tmp_path, capsys):
        from gccnmf_tpu import cli

        path, sr = wav_file
        rc = cli.separate_main(
            [
                path,
                "-o", str(tmp_path / "tb"),
                "--num-sources", "2",
                "--dictionary-size", "16",
                "--num-iterations", "5",
                "--turbo",
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["outputs"]) == 2
        for p in info["outputs"]:
            x, _ = wavio.read_wav(p)
            assert np.isfinite(x).all()

    def test_separate_cli_multiple_inputs(self, wav_file, tmp_path, capsys):
        """Several mixtures in one invocation: same-length files reuse one
        compiled program; per-file outputs stay distinct under the prefix."""
        import shutil

        from gccnmf_tpu import cli

        path, _ = wav_file
        path2 = str(tmp_path / "second_mix.wav")
        shutil.copy(path, path2)
        rc = cli.separate_main(
            [
                path, path2,
                "--num-iterations", "5",
                "--dictionary-size", "16",
                "--num-sources", "2",
                "--output-prefix", str(tmp_path / "multi"),
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["files"]) == 2
        all_outputs = [p for f in info["files"] for p in f["outputs"]]
        assert len(all_outputs) == len(set(all_outputs)) == 4
        for p in all_outputs:
            x, _ = wavio.read_wav(p)
            assert np.isfinite(x).all()
        # identical inputs → identical localization
        assert (
            info["files"][0]["target_tdoa_indexes"]
            == info["files"][1]["target_tdoa_indexes"]
        )

    def test_separate_cli_streamed_single_device(
        self, wav_file, tmp_path, capsys
    ):
        """--streamed without --time-shards takes the single-device
        sequential macro-chunk driver."""
        from gccnmf_tpu import cli

        path, _ = wav_file
        rc = cli.separate_main(
            [
                path,
                "--streamed",
                "--chunk-frames", "64",
                "--num-iterations", "5",
                "--dictionary-size", "16",
                "--num-sources", "2",
                "--output-prefix", str(tmp_path / "chunked_cli"),
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["outputs"]) == 2
        for p in info["outputs"]:
            x, _ = wavio.read_wav(p)
            assert np.isfinite(x).all()

    def test_stream_cli(self, wav_file, tmp_path, capsys, monkeypatch):
        from gccnmf_tpu import cli

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        # small dictionary via config file for speed
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.stream_main(
            ["-i", path, "-o", str(tmp_path / "o.wav"), "-c", str(cfgp)]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(info["output"])
        assert info["algorithmic_latency_ms"] == pytest.approx(64.0)

    def test_stream_cli_low_latency(self, wav_file, tmp_path, capsys, monkeypatch):
        """--low-latency must clamp the hop so the asymmetric-window COLA
        condition holds even with the default (hop = window/2) config."""
        from gccnmf_tpu import cli

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.stream_main(
            ["-i", path, "-o", str(tmp_path / "ll.wav"), "-c", str(cfgp),
             "--low-latency"]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(info["output"])
        # emit lag is synthesis_length - hop = 128 samples (8 ms); plus one
        # hop-sized block (low-latency mode emits every hop) = 16 ms total,
        # well under the symmetric 96 ms.
        assert info["algorithmic_latency_ms"] == pytest.approx(16.0)

    def test_stream_cli_sub_2ms_latency(self, wav_file, tmp_path, capsys,
                                        monkeypatch):
        """A short synthesis window reaches the reference's <2 ms claim
        (README.md:78): synthesis 24, hop 12, block 12 → 24 samples = 1.5 ms."""
        from gccnmf_tpu import cli

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.stream_main(
            ["-i", path, "-o", str(tmp_path / "ll2.wav"), "-c", str(cfgp),
             "--low-latency", "--synthesis-length", "24"]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(info["output"])
        assert info["algorithmic_latency_ms"] == pytest.approx(1.5)
        assert info["algorithmic_latency_ms"] < 2.0

    def test_stream_cli_explicit_block_size(self, wav_file, tmp_path, capsys,
                                            monkeypatch):
        """--block-size overrides the default: two hops per emitted block in
        symmetric mode doubles the block term of the latency budget."""
        from gccnmf_tpu import cli

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.stream_main(
            ["-i", path, "-o", str(tmp_path / "bs.wav"), "-c", str(cfgp),
             "--block-size", "1024"]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(info["output"])
        # symmetric default is 64 ms at block 512; block 1024 adds 32 ms
        assert info["algorithmic_latency_ms"] == pytest.approx(96.0)

    @pytest.mark.parametrize("argv_extra", [
        ["--block-size", "500"],   # not a hop multiple (hop 512)
        ["--block-size", "0"],     # 0 % hop == 0 but must still be rejected
        ["--block-size", "-512"],  # negative multiple of the hop
        ["--low-latency", "--synthesis-length", "1"],  # hop would clamp to 0
    ])
    def test_stream_cli_rejects_bad_flags(self, wav_file, tmp_path,
                                          monkeypatch, argv_extra):
        """Bad --block-size / --synthesis-length values exit with a clean
        argparse usage error, before any WAV load or pretraining work."""
        from gccnmf_tpu import cli, pretrain

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))

        def _no_pretrain(*a, **k):  # validation must fire first
            raise AssertionError("pretraining ran before flag validation")

        monkeypatch.setattr(pretrain, "get_dictionaries", _no_pretrain)
        with pytest.raises(SystemExit) as exc:
            cli.stream_main(
                ["-i", path, "-o", str(tmp_path / "x.wav")] + argv_extra
            )
        assert exc.value.code == 2  # argparse usage error

    def test_realtime_cli(self, wav_file, tmp_path, capsys, monkeypatch):
        from gccnmf_tpu import cli

        path, sr = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.realtime_main(
            ["-i", path, "-c", str(cfgp), "-o", str(tmp_path / "rt.wav"),
             "--blocks", "8", "--no-gui"]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert info["blocks"] == 8
        assert os.path.exists(info["output"])
        assert info["deadline_ms"] == pytest.approx(32.0)

    def test_enhance_cli_online(self, wav_file, tmp_path, capsys, monkeypatch):
        from gccnmf_tpu import cli

        path, _ = wav_file
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.enhance_main(
            [path, "-o", str(tmp_path / "e.wav"), "--mode", "online", "-c", str(cfgp)]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(info["output"])

    def test_enhance_cli_multiple_inputs(
        self, wav_file, tmp_path, capsys, monkeypatch
    ):
        """Several files in one invocation share one compiled enhancer;
        -o is rejected (each output lands next to its input)."""
        import shutil

        from gccnmf_tpu import cli

        path, _ = wav_file
        path2 = str(tmp_path / "second.wav")
        shutil.copy(path, path2)
        monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "3")
        monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "512")
        cfgp = tmp_path / "s.cfg"
        cfgp.write_text("[NMF]\ndictionarySize = 16\ndictionarySizes = [16]\n")
        rc = cli.enhance_main([path, path2, "-c", str(cfgp)])
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert len(info["outputs"]) == 2
        for p in info["outputs"]:
            x, _ = wavio.read_wav(p)
            assert np.isfinite(x).all()
        with pytest.raises(SystemExit):
            cli.enhance_main([path, path2, "-o", str(tmp_path / "x.wav")])


def test_serve_cli(tmp_path, monkeypatch, capsys, wav_file):
    """gccnmf-serve: two streams from the same file, lockstep ticks,
    distinct output names, valid audio."""
    monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "5")
    monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "200")
    from gccnmf_tpu.cli import serve_main

    dev_wav, _sr = wav_file
    out_dir = str(tmp_path / "out")
    serve_main(["-i", dev_wav, dev_wav, "-o", out_dir, "--blocks", "8",
                "--dictionary-size", "64"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["streams"] == 2 and result["ticks"] == 8
    assert len(set(result["outputs"])) == 2
    # serving-clock deadline accounting in the serve output (VERDICT r2
    # item 8) — same surface as gccnmf-realtime's run() stats
    assert result["deadline_ms"] == pytest.approx(32.0)
    assert 0 <= result["deadline_misses"] <= result["ticks"]
    assert result["tick_ms"]["window"] == 8
    for p in result["outputs"]:
        x, sr = wavio.read_wav(p)
        assert np.isfinite(x).all() and x.shape[-1] > 0

    # pipelined serve must produce byte-identical output files
    out_dir2 = str(tmp_path / "out2")
    serve_main(["-i", dev_wav, dev_wav, "-o", out_dir2, "--blocks", "8",
                "--dictionary-size", "64", "--pipeline-depth", "2"])
    result2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result2["ticks"] == 8
    for p1, p2 in zip(sorted(result["outputs"]), sorted(result2["outputs"])):
        x1, _ = wavio.read_wav(p1)
        x2, _ = wavio.read_wav(p2)
        np.testing.assert_array_equal(x1, x2)


class TestPretrainCLI:
    def test_pretrain_cli_trains_and_caches(self, wav_file, tmp_path, capsys):
        """gccnmf-pretrain trains the requested sizes into the cache; a
        second run loads from cache (no retraining)."""
        import time

        from gccnmf_tpu import cli

        path, sr = wav_file
        cache = str(tmp_path / "cache")
        argv = [path, "--sizes", "8", "16", "--num-iterations", "3",
                "--max-frames", "128", "--cache-dir", cache]
        rc = cli.pretrain_main(argv)
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert info["dictionaries"] == {"8": [513, 8], "16": [513, 16]}
        cached = sorted(os.listdir(cache))
        assert len(cached) == 2 and all(f.endswith(".npy") for f in cached)
        t0 = time.perf_counter()
        rc = cli.pretrain_main(argv)  # cache hit: same files, no retrain
        assert rc == 0
        assert time.perf_counter() - t0 < 5.0
        assert sorted(os.listdir(cache)) == cached

    def test_pretrain_cli_sharded(self, wav_file, tmp_path, capsys):
        """--data-shards trains over a data-parallel mesh and matches the
        single-device dictionary."""
        import numpy as np

        from gccnmf_tpu import cli

        path, sr = wav_file
        single, sharded = str(tmp_path / "c1"), str(tmp_path / "c2")
        base = [path, "--sizes", "8", "--num-iterations", "3",
                "--max-frames", "128"]
        assert cli.pretrain_main(base + ["--cache-dir", single]) == 0
        capsys.readouterr()
        assert cli.pretrain_main(
            base + ["--cache-dir", sharded, "--data-shards", "4"]
        ) == 0
        capsys.readouterr()
        w1 = np.load(os.path.join(single, os.listdir(single)[0]))
        w2 = np.load(os.path.join(sharded, os.listdir(sharded)[0]))
        np.testing.assert_allclose(w1, w2, rtol=2e-3, atol=2e-5)

    def test_pretrain_save_dir_to_dictionary_file_handoff(
        self, wav_file, tmp_path, capsys, monkeypatch
    ):
        """The production flow: gccnmf-pretrain --save-dir exports stable
        W_<size>.npy artifacts that every entry point loads directly via
        --dictionary-file, bypassing the corpus-keyed cache (whose key
        deliberately changes with corpus/iterations/seed)."""
        from gccnmf_tpu import cli, pretrain

        path, sr = wav_file
        save = tmp_path / "dicts"
        rc = cli.pretrain_main(
            [path, "--sizes", "16", "--num-iterations", "3",
             "--max-frames", "128", "--cache-dir", str(tmp_path / "c"),
             "--save-dir", str(save)]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip())
        assert info["saved"] == [str(save / "W_16.npy")]

        # any later entry point must use the artifact WITHOUT pretraining
        def _no_pretrain(*a, **k):
            raise AssertionError("pretraining ran despite --dictionary-file")

        monkeypatch.setattr(pretrain, "get_dictionaries", _no_pretrain)
        rc = cli.stream_main(
            ["-i", path, "-o", str(tmp_path / "o.wav"),
             "--dictionary-file", str(save / "W_16.npy")]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert os.path.exists(out["output"])

    def test_dictionary_file_validation(self, tmp_path, wav_file):
        from gccnmf_tpu import pretrain

        bad = tmp_path / "bad.npy"
        np.save(bad, np.ones((3, 4, 5), np.float32))
        with pytest.raises(ValueError, match="expected"):
            pretrain.load_dictionary_file(str(bad))
        wrongf = tmp_path / "wrongf.npy"
        np.save(wrongf, np.ones((100, 8), np.float32))
        with pytest.raises(ValueError, match="frequency rows"):
            pretrain.load_dictionary_file(str(wrongf), num_freq=513)
        neg = tmp_path / "neg.npy"
        np.save(neg, -np.ones((513, 8), np.float32))
        with pytest.raises(ValueError, match="nonnegative"):
            pretrain.load_dictionary_file(str(neg), num_freq=513)
