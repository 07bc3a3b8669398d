#!/usr/bin/env python
"""End-to-end Whisper fine-tuning on a device mesh (runnable demo).

Exercises the whole training stack on synthetic data: ('data','model')
mesh with tensor-sharded params and dp-sharded batches, SpecAugment on
the mels, jax.checkpoint rematerialization, AdamW with donated buffers,
and Orbax checkpoint save/resume. Runs anywhere — on CPU use:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/finetune.py --steps 5 --cpu

On TPU pods the same script scales by mesh shape; swap the synthetic
batches for a real (mel, tokens) dataset and init_params for
models.whisper.weights.load_params.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual mesh testing)")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from spittle_tpu.models.whisper.config import WhisperConfig
    from spittle_tpu.models.whisper.model import init_params
    from spittle_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from spittle_tpu.train.augment import spec_augment
    from spittle_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from spittle_tpu.train.step import make_train_step

    n_dev = len(jax.devices())
    tp = args.tp if n_dev % args.tp == 0 else 1
    mesh = make_mesh(n_dev, tp=tp)
    print(f"devices={n_dev} mesh=(data={n_dev // tp}, model={tp})")

    cfg = WhisperConfig(
        name="finetune-demo", n_mels=80, n_audio_ctx=64, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51866, n_text_ctx=24,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    ckpt_dir = args.checkpoint_dir or tempfile.mkdtemp(prefix="spittle_ft_")

    with mesh:
        params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), mesh)
        init_opt, train_step = make_train_step(
            cfg, learning_rate=1e-4,
            sequence_parallel_mesh=mesh if tp > 1 else None,
            remat=True,
        )
        opt_state = init_opt(params)

        start_step = latest_step(ckpt_dir) or 0
        if start_step:
            params, opt_state = restore_checkpoint(
                ckpt_dir, start_step, params, opt_state
            )
            print(f"resumed from step {start_step}")

        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(1)
        bs = batch_sharding(mesh)
        for step in range(start_step, args.steps):
            mel = jnp.asarray(
                rng.standard_normal(
                    (args.batch, cfg.n_mels, cfg.n_audio_ctx * 2)
                ).astype(np.float32)
            )
            key, sub = jax.random.split(key)
            mel = spec_augment(sub, mel, time_masks=4)
            batch = {
                "mel": jax.device_put(np.asarray(mel), bs),
                "tokens": jax.device_put(
                    rng.integers(0, cfg.n_vocab, (args.batch, cfg.n_text_ctx))
                    .astype(np.int32), bs),
                "targets": jax.device_put(
                    rng.integers(0, cfg.n_vocab, (args.batch, cfg.n_text_ctx))
                    .astype(np.int32), bs),
                "mask": jax.device_put(
                    np.ones((args.batch, cfg.n_text_ctx), np.float32), bs),
            }
            t0 = time.perf_counter()
            params, opt_state, loss = train_step(params, opt_state, batch)
            loss = float(loss)
            print(f"step {step}: loss={loss:.4f} "
                  f"({(time.perf_counter() - t0) * 1000:.0f} ms)")
        save_checkpoint(ckpt_dir, params, opt_state, args.steps)
        print(f"checkpoint saved to {ckpt_dir} (step {args.steps})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
