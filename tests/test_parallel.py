"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gccnmf_tpu.ops import nmf
from gccnmf_tpu.parallel import mesh as mesh_lib
from gccnmf_tpu.parallel import nmf_sharded


@pytest.fixture(scope="module")
def problem():
    g = np.random.default_rng(1234)
    t, f, k = 192, 129, 32
    v = (g.random((t, f)) + 0.05).astype(np.float32)
    w0, h0 = nmf.nmf_init_numpy(f, k, t)
    return v, w0, h0


def test_eight_devices_available():
    assert jax.device_count() == 8


class TestMesh:
    def test_make_mesh_shapes(self):
        m = mesh_lib.make_mesh()
        assert m.shape["data"] == 8 and m.shape["model"] == 1
        m2 = mesh_lib.make_mesh(model=2)
        assert m2.shape["data"] == 4 and m2.shape["model"] == 2
        with pytest.raises(ValueError):
            mesh_lib.make_mesh(data=5, model=3)

    def test_shard_batch_places_on_data_axis(self):
        m = mesh_lib.make_mesh()
        x = np.zeros((16, 4), np.float32)
        sharded = mesh_lib.shard_batch(x, m)
        assert sharded.sharding.spec == mesh_lib.P("data", None)


class TestShardedNMF:
    @pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2), (2, 4), (1, 1)])
    def test_matches_single_device(self, problem, dp, mp):
        v, w0, h0 = problem
        w_ref, h_ref = nmf.kl_nmf(jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 20)
        m = mesh_lib.make_mesh(data=dp, model=mp)
        w_got, h_got = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 20, m
        )
        # psum/all_gather reduction order drifts float32 accumulation
        np.testing.assert_allclose(
            np.asarray(w_got), np.asarray(w_ref), atol=5e-3, rtol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(h_got), np.asarray(h_ref), atol=5e-3, rtol=5e-2
        )

    def test_divergence_decreases_sharded(self, problem):
        v, w0, h0 = problem
        m = mesh_lib.make_mesh(data=4, model=2)
        before = float(nmf.kl_divergence(jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0)))
        w, h = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 10, m
        )
        after = float(nmf.kl_divergence(jnp.asarray(v), w, h))
        assert after < before

    def test_simultaneous_silence_stays_finite(self, problem):
        """Digitally silent input must not NaN the sharded turbo path — the
        same 0/0 the single-device kl_nmf_simul / Pallas twins guard
        (ADVICE r2: gain calibration, plus the w-normalization divide)."""
        _, w0, h0 = problem
        v = np.zeros((192, 129), np.float32)
        m = mesh_lib.make_mesh(data=4, model=2)
        w, h = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 6, m,
            simultaneous=True,
        )
        assert np.isfinite(np.asarray(w)).all()
        assert np.isfinite(np.asarray(h)).all()

    @pytest.mark.parametrize("dp,mp", [(4, 2), (2, 4)])
    def test_simultaneous_matches_single_device_twin(self, problem, dp, mp):
        """Sharded turbo must track ops.nmf.kl_nmf_simul (same algorithm,
        distributed), including after the guard refactor."""
        v, w0, h0 = problem
        w_ref, h_ref = nmf.kl_nmf_simul(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 15
        )
        m = mesh_lib.make_mesh(data=dp, model=mp)
        w_got, h_got = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 15, m,
            simultaneous=True,
        )
        np.testing.assert_allclose(
            np.asarray(w_got), np.asarray(w_ref), atol=5e-3, rtol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(h_got), np.asarray(h_ref), atol=5e-3, rtol=5e-2
        )

    def test_pad_time_roundtrip(self, problem):
        v, _, h0 = problem
        v2, h2, t = nmf_sharded.pad_time(v[:100], h0[:100], 8)
        assert v2.shape[0] == 104 and h2.shape[0] == 104 and t == 100

    def test_pretrain_sharded_runs(self, problem):
        v, _, _ = problem
        m = mesh_lib.make_mesh(data=4, model=2)
        w = nmf_sharded.pretrain_dictionary_sharded(v[:100], 16, 5, m)
        assert w.shape == (129, 16)
        assert np.all(w > 0)
        np.testing.assert_allclose((w ** 2).sum(0), 1.0, rtol=1e-4)

    def test_padding_effect_negligible(self, problem):
        """Epsilon-padded time rows perturb W negligibly."""
        v, w0, h0 = problem
        m = mesh_lib.make_mesh(data=8, model=1)
        w_full, _ = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v[:192]), jnp.asarray(w0), jnp.asarray(h0[:192]), 15, m
        )
        v_p, h_p, _ = nmf_sharded.pad_time(v[:190], h0[:190], 8)
        w_pad, _ = nmf_sharded.kl_nmf_sharded(
            jnp.asarray(v_p), jnp.asarray(w0), jnp.asarray(h_p), 15, m
        )
        # different data (190 vs 192 rows) but same scale of solution
        assert np.isfinite(np.asarray(w_pad)).all()
        np.testing.assert_allclose((np.asarray(w_pad) ** 2).sum(0), 1.0, rtol=1e-4)


class TestDistributedTrainer:
    def test_fit_matches_single_device(self, tmp_path):
        import jax
        from gccnmf_tpu.ops import nmf as nmf_ops
        from gccnmf_tpu.parallel import mesh as mesh_lib
        from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

        rng = np.random.default_rng(7)
        v = (rng.random((64, 33)) + 0.05).astype(np.float32)
        mesh = mesh_lib.make_mesh(data=4, model=2, devices=jax.devices()[:8])
        trainer = DistributedNMFTrainer(
            mesh, dictionary_size=8, num_iterations=12, checkpoint_every=5,
            checkpoint_dir=str(tmp_path / "ck"),
        )
        w = trainer.fit(v)
        w0, h0 = nmf_ops.nmf_init_numpy(33, 8, 64)
        w_ref, _ = nmf_ops.kl_nmf(v, w0, h0, 12)
        np.testing.assert_allclose(w, np.asarray(w_ref), rtol=2e-3, atol=2e-5)

    def test_resume_continues(self, tmp_path):
        import os as _os

        import jax
        from gccnmf_tpu.parallel import mesh as mesh_lib
        from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

        rng = np.random.default_rng(8)
        v = (rng.random((32, 17)) + 0.05).astype(np.float32)
        mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
        ck = str(tmp_path / "ck")
        kw = dict(dictionary_size=4, checkpoint_every=4, checkpoint_dir=ck)
        # interrupted run: stop after 4 of 8 iterations
        DistributedNMFTrainer(mesh, num_iterations=4, **kw).fit(v)
        assert _os.path.exists(_os.path.join(ck, "nmf_000004.npz"))
        # full-length run resumes from iteration 4 rather than restarting
        w_resumed = DistributedNMFTrainer(mesh, num_iterations=8, **kw).fit(v)
        files = sorted(f for f in _os.listdir(ck) if f.endswith(".npz"))
        assert files == ["nmf_000004.npz", "nmf_000008.npz"]
        # equals an uninterrupted 8-iteration run
        ck2 = str(tmp_path / "ck2")
        w_straight = DistributedNMFTrainer(
            mesh, num_iterations=8, dictionary_size=4,
            checkpoint_every=8, checkpoint_dir=ck2,
        ).fit(v)
        np.testing.assert_allclose(w_resumed, w_straight, rtol=1e-5)

    def test_resume_rejects_changed_dictionary_size(self, tmp_path):
        """The fingerprint must pin dictionary_size: resuming a 4-atom
        checkpoint with an 8-atom trainer has to fail loudly, not silently
        return the smaller W."""
        import jax
        from gccnmf_tpu.parallel import mesh as mesh_lib
        from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

        rng = np.random.default_rng(8)
        v = (rng.random((32, 17)) + 0.05).astype(np.float32)
        mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
        ck = str(tmp_path / "ck")
        DistributedNMFTrainer(
            mesh, dictionary_size=4, num_iterations=4,
            checkpoint_every=4, checkpoint_dir=ck,
        ).fit(v)
        with pytest.raises(ValueError, match="different problem"):
            DistributedNMFTrainer(
                mesh, dictionary_size=8, num_iterations=8,
                checkpoint_every=4, checkpoint_dir=ck,
            ).fit(v)


def test_init_distributed_single_process_noop():
    """Without a coordinator, init_distributed is a no-op returning index 0."""
    from gccnmf_tpu.parallel import mesh as mesh_lib

    assert mesh_lib.init_distributed() == 0
    import jax

    assert jax.process_count() == 1


def test_multihost_mesh_shapes():
    from gccnmf_tpu.parallel import mesh as mesh_lib
    import jax

    m = mesh_lib.multihost_mesh(model=2)
    assert m.shape["model"] == 2
    assert m.shape["data"] * 2 == jax.device_count()
    with pytest.raises(ValueError):
        mesh_lib.multihost_mesh(model=3)  # does not divide 8 local devices


def test_trainer_for_deployment(tmp_path):
    """for_deployment builds a global-mesh trainer and fits a dictionary."""
    from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

    tr = DistributedNMFTrainer.for_deployment(
        model=2,
        dictionary_size=8,
        num_iterations=4,
        checkpoint_every=2,
        checkpoint_dir=str(tmp_path),
    )
    assert tr.mesh.shape["model"] == 2
    rng = np.random.default_rng(0)
    v = (rng.random((64, 129)) + 0.05).astype(np.float32)
    w = tr.fit(v)
    assert w.shape == (129, 8)
    assert np.isfinite(w).all() and (w >= 0).all()


class TestMultiProcess:
    """Real multi-process distributed runtime: 2 OS processes × 2 virtual
    CPU devices joined through jax.distributed.initialize on a localhost
    coordinator — the DCN-analogue code paths (process_allgather, multihost
    trainer, cross-restart resume) that the in-process tests cannot reach."""

    NUM_PROCESSES = 2

    @staticmethod
    def _free_port():
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    def _spawn_round(self, tmp_path, num_iterations, tag, streamed_mix=None):
        import os
        import subprocess
        import sys

        port = self._free_port()
        worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        # the package is imported from the repo root (not pip-installed)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs, outs = [], []
        for i in range(self.NUM_PROCESSES):
            out = str(tmp_path / f"{tag}_p{i}.npz")
            outs.append(out)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable, worker,
                        "--coordinator", f"127.0.0.1:{port}",
                        "--num-processes", str(self.NUM_PROCESSES),
                        "--process-id", str(i),
                        "--ckpt-dir", str(tmp_path / "ck"),
                        "--out", out,
                        "--num-iterations", str(num_iterations),
                    ]
                    + (["--streamed-mix", streamed_mix] if streamed_mix else []),
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                )
            )
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(stdout.decode(errors="replace"))
        for p, log in zip(procs, logs):
            assert p.returncode == 0, f"worker failed:\n{log}"
        return [np.load(o) for o in outs]

    def test_multiprocess_train_gather_resume(self, tmp_path):
        import os

        from gccnmf_tpu.utils import wav as wavio

        # fixture mixture for the cross-process streamed separation: long
        # enough for 16 frames per shard on the 4-device global mesh
        g = np.random.default_rng(3)
        n = 63 * 128 + 1024
        t = np.arange(n) / 16000.0
        s1 = (g.standard_normal(n) * np.sin(2 * np.pi * 3.0 * t)).astype(np.float32)
        s2 = (g.standard_normal(n) * np.cos(2 * np.pi * 7.0 * t)).astype(np.float32)
        mix = 0.2 * np.stack([s1 + np.roll(s2, 5), np.roll(s1, 5) + s2])
        mix_path = str(tmp_path / "dist_mix.wav")
        wavio.write_wav(mix.astype(np.float32), mix_path, 16000)

        # --- round 1: fresh 6-iteration run across 2 processes ------------
        results = self._spawn_round(
            tmp_path, num_iterations=6, tag="r1", streamed_mix=mix_path
        )
        for r in results:
            assert int(r["process_count"]) == self.NUM_PROCESSES
            assert int(r["device_count"]) == 2 * self.NUM_PROCESSES
            # gather_to_host assembled the full cross-process array
            np.testing.assert_array_equal(r["gathered"], r["x"])
        # cross-process streamed separation: both processes wrote identical
        # waveforms (the multiprocess gather branch of separate_streamed)...
        np.testing.assert_array_equal(
            results[0]["streamed_est"], results[1]["streamed_est"]
        )
        np.testing.assert_array_equal(
            results[0]["streamed_targets"], results[1]["streamed_targets"]
        )
        # ...matching an in-process run on an equal-size (4-device) mesh up
        # to int16 quantization + float32 reduction-order drift
        from gccnmf_tpu.models.offline import OfflineConfig
        from gccnmf_tpu.parallel.long_audio import LongAudioSeparator

        cfg = OfflineConfig(
            num_iterations=8, dictionary_size=8, num_tdoas=32,
            num_sources=2, mic_separation_m=0.5,
        )
        mesh4 = mesh_lib.make_mesh(data=4, model=1, devices=jax.devices()[:4])
        mix_q, _ = wavio.read_wav(mix_path)
        want = LongAudioSeparator(cfg, mesh4).separate(mix_q)
        assert list(results[0]["streamed_targets"]) == list(
            want["target_tdoa_indexes"]
        )
        np.testing.assert_allclose(
            results[0]["streamed_est"],
            want["estimates"],
            atol=4.0 / 32768.0,
        )
        # both processes computed the SAME global dictionary
        np.testing.assert_allclose(
            results[0]["w"], results[1]["w"], rtol=1e-5, atol=1e-7
        )
        ck = tmp_path / "ck"
        files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
        assert files == ["nmf_000003.npz", "nmf_000006.npz"]

        # --- round 2: simulated restart resumes at 6 and reaches 12 -------
        results2 = self._spawn_round(tmp_path, num_iterations=12, tag="r2")
        files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
        assert files == [
            "nmf_000003.npz", "nmf_000006.npz",
            "nmf_000009.npz", "nmf_000012.npz",
        ]
        np.testing.assert_allclose(
            results2[0]["w"], results2[1]["w"], rtol=1e-5, atol=1e-7
        )

        # --- cross-check vs an in-process run on an equal-dp mesh ----------
        # same data-axis size (4) → same padding and shard-local compute;
        # only the process boundary differs, so results must agree to
        # float32 reduction-order tolerance.
        from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

        rng = np.random.default_rng(7)
        v = (rng.random((48, 33)) + 0.05).astype(np.float32)
        local = DistributedNMFTrainer(
            mesh_lib.make_mesh(data=4, model=1, devices=jax.devices()[:4]),
            dictionary_size=6, num_iterations=12, checkpoint_every=12,
        ).fit(v)
        np.testing.assert_allclose(
            results2[0]["w"], local, rtol=5e-4, atol=1e-6
        )
