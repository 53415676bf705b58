"""Worker + shared fixtures for the 2-process multi-host DP test.

Run as a subprocess (one per simulated host):

    python -m tests.mp_worker <process_id> <num_processes> <port> <out.npz>

Each worker joins the distributed runtime through the SAME code path the
launcher uses (`scripts.multiproc.initialize_distributed`), builds the
global (data,) mesh, feeds its EpochBatcher shard through `shard_batch`
(which assembles global arrays from per-process local data), runs the real
jitted Tacotron2 DP train step, and dumps the resulting params + losses.

The test process replays the identical global batches single-process and
requires the multi-process result to match — the multi-host equivalent of
the reference's NCCL DP (src/common/multiproc.py:38-55).
"""

from __future__ import annotations

import os
import sys

import numpy as np

N_LOCAL_DEVICES = 2
STEPS = 2
BATCH_PER_SHARD = 2
SEED = 3
PAD_TO = 4


def setup_jax_cpu(n_local: int = N_LOCAL_DEVICES):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    return jax


def tiny_cfg():
    from fac_via_ppg_tpu.configs.hparams import Tacotron2Config

    return Tacotron2Config(
        n_symbols=8, symbols_embedding_dim=8, encoder_embedding_dim=8,
        n_acoustic_feat_dims=6, decoder_rnn_dim=8, prenet_dim=4,
        attention_rnn_dim=8, attention_dim=4,
        attention_location_n_filters=2, attention_location_kernel_size=3,
        postnet_embedding_dim=8, max_decoder_steps=24,
    )


def synthetic_items(n: int = 8, d_in: int = 8, d_mel: int = 6):
    """Deterministic variable-length (ppg, mel) pairs, same on every host."""
    rng = np.random.RandomState(20260816)
    items = []
    for _ in range(n):
        t_in = int(rng.randint(6, 14))
        t_out = int(rng.randint(8, 18))
        items.append((
            np.abs(rng.rand(t_in, d_in)).astype(np.float32),
            rng.randn(t_out, d_mel).astype(np.float32) * 0.3,
        ))
    return items


def make_batcher(shard: int, num_shards: int):
    from fac_via_ppg_tpu.data.ppg_mel_dataset import (
        EpochBatcher, ppg_acoustics_collate,
    )

    return EpochBatcher(
        synthetic_items(), BATCH_PER_SHARD, SEED, ppg_acoustics_collate,
        drop_last=True, shard=shard, num_shards=num_shards, pad_to=PAD_TO,
        length_fn=lambda it: (it[0].shape[0], it[1].shape[0]),
    )


def run_training(jax, local_batches, mesh=None):
    """Run STEPS DP train steps over `local_batches` on the global mesh."""
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from fac_via_ppg_tpu.train.step import make_tacotron2_train_step

    cfg = tiny_cfg()
    params, model_state = init_tacotron2(jax.random.PRNGKey(0), cfg)
    # SGD, not Adam: Adam's first update is ~sign(grad)*lr, so float
    # reassociation between device layouts flips near-zero gradient
    # elements into +-2*lr param diffs that would mask real sharding bugs.
    # SGD keeps the single-vs-multi-process comparison sharp at 1e-5.
    import optax

    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.sgd(1e-3)
    )
    opt_state = optimizer.init(params)

    mesh = mesh if mesh is not None else make_mesh()
    params = replicate(mesh, params)
    model_state = replicate(mesh, model_state)
    opt_state = replicate(mesh, opt_state)
    train_step = make_tacotron2_train_step(cfg, optimizer, donate=False)

    losses = []
    for step, batch in enumerate(local_batches[:STEPS]):
        placed = shard_batch(mesh, tuple(np.asarray(x) for x in batch))
        out = train_step(
            params, model_state, opt_state, placed,
            jax.random.PRNGKey(100 + step),
        )
        params, model_state, opt_state = (
            out.params, out.model_state, out.opt_state
        )
        losses.append(float(out.loss))
    return params, losses


def flatten_params(params):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    return [np.asarray(x) for x in leaves], str(treedef)


def main():
    process_id, num_processes, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax = setup_jax_cpu()
    from fac_via_ppg_tpu.scripts.multiproc import initialize_distributed

    initialize_distributed(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * N_LOCAL_DEVICES

    batcher = make_batcher(jax.process_index(), jax.process_count())
    params, losses = run_training(jax, list(batcher))

    leaves, treedef = flatten_params(params)
    np.savez(
        out_path,
        losses=np.array(losses),
        treedef=np.array(treedef),
        n_leaves=np.array(len(leaves)),
        **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
    )
    print(f"worker {process_id} done: losses={losses}")


if __name__ == "__main__":
    main()
