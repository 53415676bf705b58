"""WaveGlow trainer.

Mirrors the reference driver (src/script/train_waveglow.py:66-188): 4-section
JSON config (train/data/dist/waveglow) with a snapshot into the output dir,
per-iteration loss prints, checkpoints every `iters_per_checkpoint`.

TPU-native: one jitted data-parallel step over the jax mesh; fixed-size
segment crops give a single compiled shape.  Checkpoints are orbax pytrees
(the reference pickled the whole torch module, train_waveglow.py:56-64).

Usage: python -m fac_via_ppg_tpu.scripts.train_waveglow [-c config.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs import DEFAULT_WAVEGLOW_CONFIG_PATH
from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.data.mel2samp import Mel2Samp, mel2samp_collate
from fac_via_ppg_tpu.data.ppg_mel_dataset import EpochBatcher
from fac_via_ppg_tpu.models.waveglow import init_waveglow
from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fac_via_ppg_tpu.train import checkpoint as ckpt
from fac_via_ppg_tpu.train.logger import WaveglowLogger
from fac_via_ppg_tpu.train.optim import make_optimizer
from fac_via_ppg_tpu.train.step import make_waveglow_train_step
from fac_via_ppg_tpu.utils.compilation_cache import enable_compilation_cache


def train(num_gpus, rank, group_name, output_directory, epochs, learning_rate,
          sigma, iters_per_checkpoint, batch_size, seed, checkpoint_path,
          data_config=None, waveglow_config=None, train_dtype="float32",
          grad_accum_steps=1, lr_schedule="constant", lr_warmup_steps=0,
          lr_decay_steps=0, lr_decay_rate=1.0, lr_min_factor=0.0,
          tensor_parallel_devices=1, data_parallel_devices=None,
          zero_sharded_opt_state=False, remat=False,
          compilation_cache_dir=""):
    """Signature mirrors the reference train() (train_waveglow.py:66).

    `train_dtype` is a TPU extension: "bfloat16" runs the flows' forward/
    backward in bf16 with float32 params/optimizer/logdets/loss;
    `grad_accum_steps` evaluates the batch as that many sequential
    micro-batches with averaged gradients (see train/step.py).
    `tensor_parallel_devices` > 1 builds a (data, model) mesh and shards
    the WN hidden channel over the model axis (parallel/sharding.py);
    `zero_sharded_opt_state` shards the Adam moments over the data axis
    (ZeRO-1); composes with TP (moments keep the 'model' split).
    """
    del num_gpus, rank, group_name  # single-controller JAX

    enable_compilation_cache(compilation_cache_dir or None)
    cfg = WaveGlowConfig.from_dict(waveglow_config or {})
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = init_waveglow(k_init, cfg)

    optimizer = make_optimizer(learning_rate)

    n_model = int(tensor_parallel_devices or 1)
    n_data = int(data_parallel_devices) if data_parallel_devices else None
    mesh = make_mesh(data=n_data, model=n_model)
    if n_model > 1:
        from fac_via_ppg_tpu.parallel.mesh import normalize_tree_placement
        from fac_via_ppg_tpu.parallel.sharding import (
            apply_shardings,
            waveglow_param_shardings,
        )

        param_shardings = waveglow_param_shardings(mesh, params)
        place_params = lambda p: apply_shardings(p, param_shardings)  # noqa: E731
        params = place_params(params)
        # moments inherit the TP param layout; freshly created scalars
        # (count, injected lr) are re-placed onto the mesh replicated
        opt_state = normalize_tree_placement(mesh, optimizer.init(params))
        if zero_sharded_opt_state:
            # ZeRO-1 composed with TP: moments keep the 'model' split and
            # additionally shard over 'data' on an unsharded dim
            from fac_via_ppg_tpu.parallel.sharding import (
                optimizer_state_shardings,
                waveglow_spec_fn,
            )

            opt_state = apply_shardings(
                opt_state,
                optimizer_state_shardings(
                    mesh, opt_state, param_spec_fn=waveglow_spec_fn(mesh)
                ),
            )
    else:
        place_params = lambda p: replicate(mesh, p)  # noqa: E731
        opt_state = optimizer.init(params)  # host params: plain layout
        params = place_params(params)
        if zero_sharded_opt_state:
            # ZeRO-1: Adam moments shard over the data axis
            from fac_via_ppg_tpu.parallel.sharding import (
                apply_shardings,
                optimizer_state_shardings,
            )

            opt_state = apply_shardings(
                opt_state, optimizer_state_shardings(mesh, opt_state)
            )
        else:
            opt_state = replicate(mesh, opt_state)

    step = make_waveglow_train_step(
        cfg, optimizer, sigma=sigma,
        compute_dtype=(None if train_dtype == "float32"
                       else jnp.dtype(train_dtype)),
        grad_accum=grad_accum_steps, remat=remat,
    )

    iteration = 0
    if checkpoint_path == "auto":
        checkpoint_path = ckpt.find_latest_checkpoint(
            output_directory, prefix="waveglow_"
        )
        if checkpoint_path:
            print("Auto-resume from", checkpoint_path)
    if checkpoint_path:
        restored = ckpt.load_checkpoint(
            checkpoint_path, like={"params": params, "opt_state": opt_state}
        )
        params = place_params(restored["params"])
        # re-impose the param layout on the optimizer moments too
        opt_state = jax.tree_util.tree_map(
            lambda r, t: jax.device_put(np.asarray(r), t.sharding)
            if hasattr(t, "sharding") else r,
            restored["opt_state"], opt_state,
        )
        iteration = restored["iteration"] + 1
        print(
            "Loaded checkpoint '{}' (iteration {})".format(
                checkpoint_path, restored["iteration"]
            )
        )

    trainset = Mel2Samp(**data_config)
    train_loader = EpochBatcher(
        trainset, batch_size, seed, mel2samp_collate, drop_last=True,
        shard=jax.process_index(), num_shards=jax.process_count(),
    )
    from fac_via_ppg_tpu.data.prefetch import prefetch

    place = lambda batch: shard_batch(  # noqa: E731
        mesh, tuple(np.asarray(x) for x in batch)
    )

    log_dir = os.path.join(output_directory, "log")
    logger = None
    if jax.process_index() == 0:
        os.makedirs(log_dir, exist_ok=True)
        print("output directory", output_directory)
        print("log directory", log_dir)
        logger = WaveglowLogger(log_dir)

    saver = ckpt.AsyncCheckpointSaver()
    epoch_offset = max(0, int(iteration / max(len(train_loader), 1)))
    try:
        from fac_via_ppg_tpu.train.optim import make_lr_schedule

        schedule = make_lr_schedule(
            learning_rate, schedule=lr_schedule,
            warmup_steps=lr_warmup_steps, decay_steps=lr_decay_steps,
            decay_rate=lr_decay_rate, min_factor=lr_min_factor,
        )
        from fac_via_ppg_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            result = _waveglow_epoch_loop(
                epochs, epoch_offset, train_loader, place, step, params,
                opt_state, learning_rate, schedule, iters_per_checkpoint,
                output_directory, logger, saver, iteration, guard,
            )
    except BaseException:
        # land any announced in-flight checkpoint even on crash/interrupt
        # (checkpoint_path='auto' recovery depends on it) — without
        # letting a save failure mask the real error
        try:
            saver.wait()
        except BaseException as save_err:
            print(f"WARNING: final async checkpoint save failed: "
                  f"{save_err!r}")
        raise
    saver.wait()
    return result


def _waveglow_epoch_loop(epochs, epoch_offset, train_loader, place, step,
                         params, opt_state, base_lr, lr_schedule,
                         iters_per_checkpoint, output_directory, logger,
                         saver, iteration, guard=None):
    """Checkpoints store `base_lr`, not the scheduled per-step value —
    resume rebuilds the schedule from the base and the restored iteration
    (saving a mid-warmup/mid-decay value would restart training at the
    wrong, possibly zero, LR)."""
    from fac_via_ppg_tpu.data.prefetch import prefetch

    for epoch in range(epoch_offset, epochs):
        print("Epoch: {}".format(epoch))
        # batch N+1 collation/H2D overlaps step N on device
        for device_batch in prefetch(train_loader, place, depth=2):
            start = time.perf_counter()
            opt_state.hyperparams["learning_rate"] = lr_schedule(iteration)
            out = step(params, opt_state, device_batch)
            params, opt_state = out.params, out.opt_state
            reduced_loss = float(out.loss)
            duration = time.perf_counter() - start

            print("{}:\t{:.9f}\t({:.2f}s/it)".format(
                iteration, reduced_loss, duration))
            if logger is not None:
                logger.log_training(reduced_loss, iteration)

            if iteration % iters_per_checkpoint == 0:
                if jax.process_index() == 0:
                    path = "{}/waveglow_{}".format(output_directory, iteration)
                    print(
                        "Saving model and optimizer state at iteration "
                        "{} to {}".format(iteration, path)
                    )
                    # non-blocking: readback + write happen on a saver
                    # thread while training continues
                    saver.save(
                        path, params, opt_state, base_lr, iteration
                    )
            iteration += 1

            if guard is not None and guard.should_stop():
                last = iteration - 1
                if (jax.process_index() == 0
                        and last % iters_per_checkpoint != 0):
                    path = "{}/waveglow_{}".format(output_directory, last)
                    print(
                        "Preemption: saving final checkpoint at iteration "
                        "{} to {}".format(last, path)
                    )
                    saver.save(path, params, opt_state, base_lr, last)
                print("Preemption: exiting cleanly after iteration", last)
                return params, opt_state, iteration

    return params, opt_state, iteration


def main(config_file_path: str = DEFAULT_WAVEGLOW_CONFIG_PATH, **overrides):
    with open(config_file_path) as f:
        config = json.load(f)

    train_config = dict(config["train_config"])
    # mesh-shape extensions are CLI/override-only keys (absent from the
    # reference's config.json sections)
    mesh_keys = ("tensor_parallel_devices", "data_parallel_devices",
                 "zero_sharded_opt_state")
    train_config.update(
        {k: v for k, v in overrides.items()
         if k in train_config or k in mesh_keys}
    )
    data_config = dict(config["data_config"])
    data_config.update(
        {k: v for k, v in overrides.items() if k in data_config}
    )
    dist_config = config.get("dist_config", {})
    waveglow_config = config["waveglow_config"]

    if not os.path.exists(train_config["output_directory"]):
        os.makedirs(train_config["output_directory"], exist_ok=True)

    # Snapshot the resolved config (reference train_waveglow.py:163-166).
    snapshot = os.path.join(train_config["output_directory"], "config.json")
    with open(snapshot, "w") as writer:
        json.dump(config, writer)

    print("Devices:", jax.devices())
    return train(
        jax.device_count(), dist_config.get("rank", 0),
        dist_config.get("group_name", ""), **train_config,
        data_config=data_config, waveglow_config=waveglow_config,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default=DEFAULT_WAVEGLOW_CONFIG_PATH,
                        help="JSON file for configuration")
    parser.add_argument("overrides", nargs="*",
                        help="key=value overrides for train/data config")
    args = parser.parse_args()
    overrides = {}
    for arg in args.overrides:
        k, _, v = arg.partition("=")
        try:
            import ast

            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    main(args.config, **overrides)
