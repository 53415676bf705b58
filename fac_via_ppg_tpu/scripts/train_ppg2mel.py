"""PPG2Mel (Tacotron2) trainer.

Mirrors the reference driver (src/script/train_ppg2mel.py:180-305): hparams
snapshot to output_dir/hparams.txt, eager dataset build, checkpoint resume /
warm-start with epoch_offset recomputation, per-iteration loss/grad-norm/
duration logging, validate + checkpoint every `iters_per_checkpoint`.

TPU-native differences:
  * the train step is one jitted, data-parallel XLA program over a
    (data, model) mesh — `n_gpus`/`distributed_run` map to mesh size, and
    there is no process-per-device, no NCCL rendezvous;
  * batches are bucket-padded (`length_bucket_size`) so the step compiles a
    bounded number of shapes;
  * checkpoints are orbax pytrees ({iteration, params, opt_state,
    learning_rate, model_state}).

Usage: python -m fac_via_ppg_tpu.scripts.train_ppg2mel  (options via
create_hparams kwargs, same as the reference).
"""

from __future__ import annotations

import math
import os
import time
from pprint import pprint

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, create_hparams
from fac_via_ppg_tpu.data.ppg_mel_dataset import (
    EpochBatcher,
    PPGMelDataset,
    ppg_acoustics_collate,
)
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fac_via_ppg_tpu.train import checkpoint as ckpt
from fac_via_ppg_tpu.train.logger import Tacotron2Logger
from fac_via_ppg_tpu.utils.compilation_cache import enable_compilation_cache
from fac_via_ppg_tpu.train.optim import make_optimizer
from fac_via_ppg_tpu.train.step import (
    make_tacotron2_eval_step,
    make_tacotron2_train_step,
)


def prepare_dataloaders(hparams):
    trainset = PPGMelDataset(hparams.training_files, hparams)
    hparams.load_feats_from_disk = False
    hparams.is_cache_feats = False
    hparams.feats_cache_path = ""
    valset = PPGMelDataset(
        hparams.validation_files, hparams,
        deps=getattr(trainset, "ppg_deps", None),
    )
    pad_to = getattr(hparams, "length_bucket_size", 1)
    train_loader = EpochBatcher(
        trainset, hparams.batch_size, hparams.seed, ppg_acoustics_collate,
        drop_last=True,
        shard=jax.process_index(), num_shards=jax.process_count(),
        pad_to=pad_to,
        length_fn=lambda item: (item[0].shape[0], item[1].shape[0]),
    )
    return train_loader, valset


def prepare_directories_and_logger(output_directory, log_directory):
    logger = None
    if jax.process_index() == 0:
        os.makedirs(output_directory, exist_ok=True)
        logger = Tacotron2Logger(os.path.join(output_directory, log_directory))
    return logger


def validate(cfg, eval_step, params, model_state, valset, iteration,
             batch_size, logger, pad_to):
    loader = EpochBatcher(
        valset, batch_size, 0, ppg_acoustics_collate, drop_last=False,
        pad_to=pad_to,
    )
    val_loss, n = 0.0, 0
    last = None
    for batch in loader:
        ppg, in_len, mel, gate, out_len = batch
        loss, out = eval_step(
            params, model_state, tuple(map(np.asarray, batch)),
            jax.random.PRNGKey(iteration),
        )
        val_loss += float(loss)
        n += 1
        last = ((mel, gate), out)
    val_loss /= max(n, 1)
    if logger is not None and last is not None:
        print("Validation loss {}: {:9f}  ".format(iteration, val_loss))
        y, y_pred = last
        logger.log_validation(val_loss, params, y, y_pred, iteration)
    return val_loss


def train(output_directory, log_directory, checkpoint_path, warm_start,
          n_gpus, rank, group_name, hparams):
    """Main training driver (signature matches the reference train())."""
    del rank, group_name  # single-controller JAX: no per-process identity

    enable_compilation_cache(
        getattr(hparams, "compilation_cache_dir", "") or None
    )
    cfg = Tacotron2Config.from_hparams(hparams)
    key = jax.random.PRNGKey(hparams.seed)
    key, k_init = jax.random.split(key)
    params, model_state = init_tacotron2(k_init, cfg)

    learning_rate = hparams.learning_rate
    optimizer = make_optimizer(
        learning_rate, hparams.weight_decay, hparams.grad_clip_thresh
    )
    opt_state = optimizer.init(params)

    n_data = getattr(hparams, "data_parallel_devices", "") or None
    n_model = int(getattr(hparams, "tensor_parallel_devices", 1) or 1)
    mesh = make_mesh(data=int(n_data) if n_data else None, model=n_model)
    if n_model > 1:
        # tensor-parallel sharding of the wide PPG-facing matrices
        from fac_via_ppg_tpu.parallel.sharding import (
            apply_shardings,
            tacotron2_param_shardings,
        )

        param_shardings = tacotron2_param_shardings(mesh, params)
        place_params = lambda p: apply_shardings(p, param_shardings)  # noqa: E731
    else:
        place_params = lambda p: replicate(mesh, p)  # noqa: E731
    params = place_params(params)
    if n_model > 1:
        # moments follow the TP param layout; fresh scalars (count,
        # injected lr) are re-placed onto the mesh replicated
        from fac_via_ppg_tpu.parallel.mesh import normalize_tree_placement

        opt_state = normalize_tree_placement(mesh, optimizer.init(params))
        if getattr(hparams, "zero_sharded_opt_state", False):
            # ZeRO-1 composed with TP: moments keep the 'model' split and
            # additionally shard over 'data' on an unsharded dim
            from fac_via_ppg_tpu.parallel.sharding import (
                apply_shardings,
                optimizer_state_shardings,
                tacotron2_spec_fn,
            )

            opt_state = apply_shardings(
                opt_state,
                optimizer_state_shardings(
                    mesh, opt_state, param_spec_fn=tacotron2_spec_fn(mesh)
                ),
            )
    elif getattr(hparams, "zero_sharded_opt_state", False):
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
    model_state = replicate(mesh, model_state)

    train_dtype = getattr(hparams, "train_dtype", "float32")
    train_step = make_tacotron2_train_step(
        cfg, optimizer, hparams.mel_weight, hparams.gate_weight,
        compute_dtype=(None if train_dtype == "float32"
                       else jnp.dtype(train_dtype)),
        grad_accum=getattr(hparams, "grad_accum_steps", 1),
        remat=bool(getattr(hparams, "remat", False)),
    )
    eval_step = make_tacotron2_eval_step(
        cfg, hparams.mel_weight, hparams.gate_weight
    )

    logger = prepare_directories_and_logger(output_directory, log_directory)
    train_loader, valset = prepare_dataloaders(hparams)
    pad_to = getattr(hparams, "length_bucket_size", 1)

    iteration = 0
    epoch_offset = 0
    if checkpoint_path == "auto":
        # crash recovery: resume from the newest checkpoint in the run dir
        checkpoint_path = ckpt.find_latest_checkpoint(output_directory)
        if checkpoint_path:
            print("Auto-resume from", checkpoint_path)
    if checkpoint_path:
        if warm_start:
            print("Warm starting model from checkpoint '%s'" % checkpoint_path)
            params = place_params(ckpt.warm_start(checkpoint_path))
        else:
            restored = ckpt.load_checkpoint(
                checkpoint_path,
                like={
                    "params": params,
                    "opt_state": opt_state,
                    "model_state": model_state,
                },
            )
            params = place_params(restored["params"])
            # re-impose the template layout (TP moment layout / ZeRO-1
            # data-sharded moments / plain replication) on restored state
            opt_state = jax.tree_util.tree_map(
                lambda r, t: jax.device_put(np.asarray(r), t.sharding)
                if hasattr(t, "sharding") else r,
                restored["opt_state"], opt_state,
            )
            model_state = replicate(
                mesh, restored.get("model_state", model_state)
            )
            if hparams.use_saved_learning_rate:
                learning_rate = restored["learning_rate"]
            iteration = restored["iteration"] + 1
            epoch_offset = max(0, int(iteration / len(train_loader)))
            print(
                "Loaded checkpoint '%s' from iteration %d"
                % (checkpoint_path, iteration - 1)
            )

    from fac_via_ppg_tpu.data.prefetch import prefetch
    from fac_via_ppg_tpu.train.profiling import trace

    if train_dtype == "bfloat16":
        # The bf16 step's first op casts the PPG input to bf16 inside the
        # jit (train/step.py loss_fn) — rounding it on the HOST instead is
        # bit-identical (same f32->bf16 round-to-nearest-even) and halves
        # the dominant host->device bytes: the (B, 5816, T) PPG is ~98% of
        # the batch.  Mel stays f32 (it is also the f32 loss target).
        _ppg_wire = jnp.bfloat16

        def place(batch):
            ppg, in_len, mel, gate, out_len = (np.asarray(x) for x in batch)
            ppg = ppg.astype(_ppg_wire)
            return shard_batch(mesh, (ppg, in_len, mel, gate, out_len))
    else:
        place = lambda batch: shard_batch(  # noqa: E731
            mesh, tuple(np.asarray(x) for x in batch)
        )
    with trace(getattr(hparams, "profile_dir", "")):
        return _train_loop(
            hparams, cfg, mesh, params, model_state, opt_state, optimizer,
            train_step, eval_step, train_loader, valset, logger, key,
            learning_rate, iteration, epoch_offset, output_directory, pad_to,
            place,
        )


def _train_loop(hparams, cfg, mesh, params, model_state, opt_state, optimizer,
                train_step, eval_step, train_loader, valset, logger, key,
                learning_rate, iteration, epoch_offset, output_directory,
                pad_to, place):
    from fac_via_ppg_tpu.data.prefetch import prefetch

    from fac_via_ppg_tpu.train.preemption import PreemptionGuard

    saver = ckpt.AsyncCheckpointSaver()
    try:
        with PreemptionGuard() as guard:
            result = _epoch_loop(
                hparams, cfg, mesh, params, model_state, opt_state,
                optimizer, train_step, eval_step, train_loader, valset,
                logger, key, learning_rate, iteration, epoch_offset,
                output_directory, pad_to, place, prefetch, saver, guard,
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


def _epoch_loop(hparams, cfg, mesh, params, model_state, opt_state, optimizer,
                train_step, eval_step, train_loader, valset, logger, key,
                learning_rate, iteration, epoch_offset, output_directory,
                pad_to, place, prefetch, saver, guard=None):
    from fac_via_ppg_tpu.train.optim import make_lr_schedule

    # `learning_rate` stays the BASE rate: checkpoints store it (so
    # use_saved_learning_rate rebases correctly on resume — saving the
    # scheduled per-step value would compound decay, or freeze LR at a
    # warmup 0.0); the schedule recomputes the per-step value from the
    # restored iteration.
    base_lr = learning_rate
    lr_schedule = make_lr_schedule(
        base_lr,
        schedule=getattr(hparams, "lr_schedule", "constant"),
        warmup_steps=getattr(hparams, "lr_warmup_steps", 0),
        decay_steps=getattr(hparams, "lr_decay_steps", 0),
        decay_rate=getattr(hparams, "lr_decay_rate", 1.0),
        min_factor=getattr(hparams, "lr_min_factor", 0.0),
    )
    for epoch in range(epoch_offset, hparams.epochs):
        print("Epoch: {}".format(epoch))
        # Collation + H2D transfer of batch N+1 overlap step N on device.
        for device_batch in prefetch(train_loader, place, depth=2):
            start = time.perf_counter()
            # reference rewrites lr every iteration (train_ppg2mel.py:234);
            # the schedule is a TPU extension and is the constant
            # learning_rate by default
            current_lr = lr_schedule(iteration)
            opt_state.hyperparams["learning_rate"] = current_lr

            key, k_step = jax.random.split(key)
            out = train_step(
                params, model_state, opt_state, device_batch, k_step
            )
            params, model_state, opt_state = (
                out.params, out.model_state, out.opt_state,
            )
            reduced_loss = float(out.loss)
            grad_norm = float(out.grad_norm)

            if not math.isnan(reduced_loss) and jax.process_index() == 0:
                duration = time.perf_counter() - start
                print(
                    "Train loss {} {:.6f} Grad Norm {:.6f} {:.2f}s/it".format(
                        iteration, reduced_loss, grad_norm, duration
                    )
                )
                if logger is not None:
                    logger.log_training(
                        reduced_loss, grad_norm, current_lr, duration,
                        iteration,
                    )

            if iteration % hparams.iters_per_checkpoint == 0:
                validate(cfg, eval_step, params, model_state, valset,
                         iteration, hparams.batch_size, logger, pad_to)
                if jax.process_index() == 0:
                    path = os.path.join(
                        output_directory, "checkpoint_{}".format(iteration)
                    )
                    print(
                        "Saving model and optimizer state at iteration "
                        "{} to {}".format(iteration, path)
                    )
                    # non-blocking: readback + write happen on a saver
                    # thread while training continues
                    saver.save(
                        path, params, opt_state, learning_rate, iteration,
                        model_state,
                    )

            iteration += 1

            if guard is not None and guard.should_stop():
                last = iteration - 1
                if (jax.process_index() == 0
                        and last % hparams.iters_per_checkpoint != 0):
                    path = os.path.join(
                        output_directory, "checkpoint_{}".format(last)
                    )
                    print(
                        "Preemption: saving final checkpoint at iteration "
                        "{} to {}".format(last, path)
                    )
                    saver.save(
                        path, params, opt_state, learning_rate, last,
                        model_state,
                    )
                print(
                    "Preemption: exiting cleanly after iteration", last
                )
                return params, model_state, opt_state, iteration

    return params, model_state, opt_state, iteration


def main(**kwargs):
    hparams = create_hparams(**kwargs)

    if not hparams.output_directory:
        raise FileExistsError("Please specify the output dir.")
    os.makedirs(hparams.output_directory, exist_ok=True)

    with open(
        os.path.join(hparams.output_directory, "hparams.txt"), "w"
    ) as writer:
        pprint(hparams.__dict__, writer)

    print("Devices:", jax.devices())
    return train(
        hparams.output_directory, hparams.log_directory,
        hparams.checkpoint_path, hparams.warm_start, hparams.n_gpus,
        hparams.rank, hparams.group_name, hparams,
    )


if __name__ == "__main__":
    import sys

    # "key=value" CLI overrides, e.g. output_directory=/tmp/run epochs=2
    overrides = {}
    for arg in sys.argv[1:]:
        k, _, v = arg.partition("=")
        try:
            import ast

            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    main(**overrides)
