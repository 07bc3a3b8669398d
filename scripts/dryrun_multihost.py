"""Multi-host dryrun worker: one process of an N-process DCN mesh.

VERDICT r3 next-round #4 ("prove the mesh code is multi-host-safe"): run
under jax.distributed with multiple processes x N CPU devices each, build
the process-spanning ('data','model') mesh, and exercise

  1. the dp+tp(+sp) AdamW train step with parameters sharded through
     shard_params (multihost-safe global_put path) and the batch built
     from per-process local rows,
  2. sharded serving placement: WhisperEngine._place_windows on the
     process-spanning data mesh, asserting per-process addressable
     shards only.

Spawned by tests/test_multihost.py and by __graft_entry__.dryrun_multichip
(processes=2 form):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python scripts/dryrun_multihost.py --coordinator localhost:PORT \
      --num-processes 2 --process-id {0,1}

The reference has no distributed counterpart (single desktop process,
SURVEY.md §2.8) — this is the north-star "across chips/hosts via ICI/DCN"
obligation.
"""

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--tp", type=int, default=2)
    args = ap.parse_args()

    import os

    import jax

    # The axon TPU plugin in this image ignores JAX_PLATFORMS; force the
    # platform through the config API before backend init (same pattern
    # as tests/conftest.py).
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from spittle_tpu.models.whisper.config import WhisperConfig
    from spittle_tpu.models.whisper.model import init_params
    from spittle_tpu.parallel.mesh import make_mesh, shard_params
    from spittle_tpu.parallel.multihost import (
        global_batch_from_local,
        mesh_is_multiprocess,
        replicated_to_host,
    )
    from spittle_tpu.train.step import make_train_step

    pid = jax.process_index()
    n_local = len(jax.local_devices())
    n_global = jax.device_count()
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert n_global == args.num_processes * n_local, (n_global, n_local)
    print(f"[p{pid}] devices: {n_local} local / {n_global} global",
          flush=True)

    tp = args.tp if n_global % args.tp == 0 else 1
    mesh = make_mesh(n_global, tp=tp)
    assert mesh_is_multiprocess(mesh), "mesh does not span processes"
    # tp pairs must sit inside one host (tp rides ICI, dp rides DCN):
    # jax.devices() orders by process, so with n_local % tp == 0 each
    # mesh row is intra-process.
    if n_local % tp == 0:
        for row in mesh.devices.reshape(-1, tp):
            assert len({d.process_index for d in row}) == 1, row

    cfg = WhisperConfig(
        name="multihost-dryrun", n_mels=80, n_audio_ctx=32,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2, n_vocab=51866,
        n_text_ctx=16, n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    dp = n_global // tp
    local_rows = max(dp // args.num_processes, 1) * 2  # rows this host owns

    with mesh:
        params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
        # every process must hold only its local shards
        some_leaf = params["decoder"]["blocks"]["wq"]
        assert all(s.device.process_index == pid
                   for s in some_leaf.addressable_shards)

        init_opt, train_step = make_train_step(
            cfg, sequence_parallel_mesh=mesh if tp > 1 else None, remat=True,
        )
        opt_state = init_opt(params)

        rng = np.random.default_rng(100 + pid)  # per-host batch rows
        batch = {
            "mel": global_batch_from_local(
                rng.standard_normal(
                    (local_rows, cfg.n_mels, cfg.n_audio_ctx * 2)
                ).astype(np.float32), mesh, P("data")),
            "tokens": global_batch_from_local(
                rng.integers(0, cfg.n_vocab, (local_rows, cfg.n_text_ctx))
                .astype(np.int32), mesh, P("data")),
            "targets": global_batch_from_local(
                rng.integers(0, cfg.n_vocab, (local_rows, cfg.n_text_ctx))
                .astype(np.int32), mesh, P("data")),
            "mask": global_batch_from_local(
                np.ones((local_rows, cfg.n_text_ctx), np.float32),
                mesh, P("data")),
        }
        gb = batch["mel"].shape[0]
        assert gb == local_rows * args.num_processes, gb

        params, opt_state, loss = train_step(params, opt_state, batch)
        loss_val = float(replicated_to_host(loss))
        assert np.isfinite(loss_val), loss_val
        # second step proves optimizer state round-trips under the mesh
        params, opt_state, loss2 = train_step(params, opt_state, batch)
        loss2_val = float(replicated_to_host(loss2))
        assert np.isfinite(loss2_val)
        print(f"[p{pid}] MULTIHOST TRAIN OK dp={dp} tp={tp} "
              f"global_batch={gb} loss={loss_val:.6f} "
              f"loss2={loss2_val:.6f}", flush=True)

    # -- sharded serving placement over the process-spanning data mesh --
    from spittle_tpu.engine.whisper_engine import WhisperEngine

    serve_mesh = Mesh(
        np.asarray(jax.devices()).reshape(n_global), ("data",)
    )
    eng = WhisperEngine()
    eng.mesh = serve_mesh
    local_windows = np.zeros((n_local, 80, 64), np.float32) + pid
    placed = eng._place_windows(local_windows)
    assert placed.shape[0] == n_global, placed.shape
    shards = placed.addressable_shards
    assert len(shards) == n_local, len(shards)
    assert all(s.device.process_index == pid for s in shards)
    # each host's rows carry its own marker value
    assert all(float(np.asarray(s.data)[0, 0, 0]) == float(pid)
               for s in shards)
    print(f"[p{pid}] MULTIHOST SERVING PLACEMENT OK "
          f"(global batch {placed.shape[0]}, {n_local} local shards)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
