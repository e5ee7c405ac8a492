"""Subprocess worker for the real multi-process distributed test.

Launched N times by tests/test_parallel.py::TestMultiProcess with a shared
localhost coordinator; each process gets 2 virtual CPU devices, so N=2
processes form a 4-device global runtime. Exercises the code paths that
single-process tests cannot reach:

- ``mesh.init_distributed`` with an explicit coordinator (mesh.py:62-108);
- ``DistributedNMFTrainer.for_deployment`` on a genuinely multi-process
  global mesh, including checkpoint save (process 0 only) and resume
  across a simulated restart (trainer.py:33-43, 103-124);
- ``gather_to_host`` on a cross-process-sharded array — the
  ``process_allgather`` branch (mesh.py:40-59).
"""

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-iterations", type=int, required=True)
    ap.add_argument("--streamed-mix", default=None,
                    help="optional WAV path: also run disk-streamed "
                         "long-audio separation over the cross-process "
                         "mesh (covers separate_streamed's multiprocess "
                         "gather output branch)")
    args = ap.parse_args()

    # 2 virtual CPU devices per process; force CPU before backend init
    # (the environment pins an experimental TPU platform otherwise)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gccnmf_tpu.parallel import mesh as mesh_lib
    from gccnmf_tpu.parallel.trainer import DistributedNMFTrainer

    idx = mesh_lib.init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert idx == args.process_id, (idx, args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 2

    # every process feeds the same deterministic corpus (trainer contract)
    rng = np.random.default_rng(7)
    v = (rng.random((48, 33)) + 0.05).astype(np.float32)

    trainer = DistributedNMFTrainer.for_deployment(
        dictionary_size=6,
        num_iterations=args.num_iterations,
        checkpoint_every=3,
        checkpoint_dir=args.ckpt_dir,
    )
    assert trainer.mesh.shape["data"] == 2 * args.num_processes
    w = trainer.fit(v)

    # gather_to_host across processes: the data axis spans both processes,
    # so the array is NOT fully addressable and np.asarray would raise
    ndev = jax.device_count()
    x = np.arange(ndev * 5, dtype=np.float32).reshape(ndev, 5)
    xs = jax.device_put(x, NamedSharding(trainer.mesh, P("data", None)))
    assert not xs.is_fully_addressable
    gathered = mesh_lib.gather_to_host(xs)

    extra = {}
    if args.streamed_mix:
        # disk-streamed separation on the global (cross-process) data mesh:
        # input chunks load per-process via make_array_from_callback, the
        # output side takes the multiprocess gather branch
        # (long_audio.py separate_streamed, process_count > 1)
        from gccnmf_tpu.models.offline import OfflineConfig
        from gccnmf_tpu.parallel.long_audio import LongAudioSeparator
        from gccnmf_tpu.utils import wav as wavio

        cfg = OfflineConfig(
            num_iterations=8, dictionary_size=8, num_tdoas=32,
            num_sources=2, mic_separation_m=0.5,
        )
        sep = LongAudioSeparator(cfg)  # data mesh over all global devices
        prefix = args.out[: -len(".npz")] + "_streamed"
        res = sep.separate_streamed(args.streamed_mix, output_prefix=prefix)
        extra = dict(
            streamed_est=np.stack(
                [wavio.read_wav(p)[0] for p in res["paths"]]
            ),
            streamed_targets=np.asarray(res["target_tdoa_indexes"]),
        )

    np.savez(
        args.out,
        w=np.asarray(w),
        gathered=np.asarray(gathered),
        x=x,
        process_count=jax.process_count(),
        device_count=ndev,
        **extra,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
