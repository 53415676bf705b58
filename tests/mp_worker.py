"""Worker + shared fixtures for the 2-process multi-host tests.

Run as a subprocess (one per simulated host):

    python -m tests.mp_worker <process_id> <num_processes> <port> <out.npz>

Each worker joins the distributed runtime through the SAME code path the
launcher uses (`scripts.multiproc.initialize_distributed`) and runs three
phases over the global 2-process x 2-device mesh:

  dp     — jitted Tacotron2 DP train step on disjoint EpochBatcher shards
           (the multi-host equivalent of the reference's NCCL DP,
           src/common/multiproc.py:38-55)
  tp     — the same step on a (2 data x 2 model) mesh with the prenet
           TP shardings: the data axis crosses the process boundary while
           the model axis stays host-local
  serve  — one fused DP serving call (batched autoregressive decode ->
           vocoder, the eval/fused.py device program) with the utterance
           batch sharded across both processes

and dumps params/losses/audio for the test process to compare against a
single-process replay.
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
        scan_unroll=1,  # 4x-unrolled scans explode CPU compile time
    )


TP_D_IN = 64  # TP-phase PPG width; wide_threshold below admits it


def tp_cfg():
    """tiny_cfg with a TP_D_IN-wide PPG prenet, sharded via an explicit
    wide_threshold (the production default of 1024 reflects a worth-it
    policy, not a correctness bound — toy scale exercises the same
    sharded program shape at single-core-CI compile cost)."""
    import dataclasses

    return dataclasses.replace(tiny_cfg(), n_symbols=TP_D_IN)


def synthetic_items(n: int = 8, d_in: int = 8, d_mel: int = 6):
    """Deterministic variable-length (ppg, mel) pairs, same on every host.

    n must be BATCH_PER_SHARD * num_shards * STEPS so every shard yields
    STEPS batches (make_batcher computes it)."""
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


def make_batcher(shard: int, num_shards: int, d_in: int = 8):
    from fac_via_ppg_tpu.data.ppg_mel_dataset import (
        EpochBatcher, ppg_acoustics_collate,
    )

    return EpochBatcher(
        synthetic_items(n=BATCH_PER_SHARD * num_shards * STEPS, d_in=d_in),
        BATCH_PER_SHARD, SEED,
        ppg_acoustics_collate,
        drop_last=True, shard=shard, num_shards=num_shards, pad_to=PAD_TO,
        length_fn=lambda it: (it[0].shape[0], it[1].shape[0]),
    )


def run_training(jax, local_batches, mesh=None, tensor_parallel=False):
    """Run STEPS train steps over `local_batches` on the global mesh.

    `tensor_parallel=True` applies the Tacotron2 prenet TP shardings
    (parallel/sharding.py) instead of full replication — `mesh` must then
    carry a 'model' axis > 1.
    """
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from fac_via_ppg_tpu.train.step import make_tacotron2_train_step

    cfg = tp_cfg() if tensor_parallel else tiny_cfg()
    params, model_state = init_tacotron2(jax.random.PRNGKey(0), cfg)
    # SGD, not Adam: Adam's first update is ~sign(grad)*lr, so float
    # reassociation between device layouts flips near-zero gradient
    # elements into +-2*lr param diffs that would mask real sharding bugs.
    # SGD keeps the single-vs-multi-process comparison sharp at 1e-5.
    import optax

    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.sgd(1e-3)
    )

    mesh = mesh if mesh is not None else make_mesh()
    if tensor_parallel:
        from jax.sharding import PartitionSpec as P

        from fac_via_ppg_tpu.parallel.sharding import (
            apply_shardings, tacotron2_param_shardings,
        )

        shardings = tacotron2_param_shardings(
            mesh, params, wide_threshold=TP_D_IN
        )
        assert any(
            s.spec != P() for s in jax.tree_util.tree_leaves(shardings)
        ), "TP sharded nothing — cfg not wide enough"
        params = apply_shardings(params, shardings)
    else:
        params = replicate(mesh, params)
    model_state = replicate(mesh, model_state)
    opt_state = optimizer.init(params)
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


SERVE_BATCH = 4
SERVE_T_IN = 10


def serve_batch_host(serve_batch: int = SERVE_BATCH):
    """Deterministic global serving batch (same on every host).  The
    first SERVE_BATCH rows are identical for any serve_batch, so results
    on those rows are comparable across topologies."""
    rng = np.random.RandomState(20260817)
    ppg = np.abs(
        rng.rand(max(serve_batch, SERVE_BATCH), 8, SERVE_T_IN)
    ).astype(np.float32)[:serve_batch]
    ppg /= ppg.sum(axis=1, keepdims=True)
    lengths = np.full((serve_batch,), SERVE_T_IN, np.int32)
    return ppg, lengths


def run_serving(jax, mesh, serve_batch: int = SERVE_BATCH):
    """One fused DP serving call (batched gate-stopped decode -> vocoder,
    sigma=0) over `mesh`, batch sharded on 'data'.  Returns the GLOBAL
    audio/mel_lens via per-process allgather of addressable shards —
    callers on any topology see identical arrays if the program is
    sharding-invariant."""
    import jax.numpy as jnp

    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
    from fac_via_ppg_tpu.models.tacotron2 import (
        init_tacotron2, tacotron2_inference_batched,
    )
    from fac_via_ppg_tpu.models.waveglow import (
        init_waveglow, remove_weightnorm, waveglow_infer,
    )
    from fac_via_ppg_tpu.parallel.mesh import replicate, shard_batch

    cfg = tiny_cfg()
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(7), cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=cfg.n_acoustic_feat_dims, hop_length=32,
        n_flows=2, n_group=8, n_early_every=4, n_early_size=2,
        wn_n_layers=2, wn_n_channels=16, wn_kernel_size=3,
        upsample_kernel_size=64,
    )
    wg_params = remove_weightnorm(
        init_waveglow(jax.random.PRNGKey(8), wg_cfg)
    )
    t2_params = replicate(mesh, t2_params)
    t2_state = replicate(mesh, t2_state)
    wg_params = replicate(mesh, wg_params)

    def serve(t2_p, t2_s, wg_p, ppg, lengths, key):
        k_mel, k_wg = jax.random.split(key)
        _, mel_post, _, _, mel_lens = tacotron2_inference_batched(
            cfg, t2_p, t2_s, ppg, lengths, k_mel
        )
        audio = waveglow_infer(wg_cfg, wg_p, mel_post, 0.0, k_wg)
        return audio, mel_lens

    ppg, lengths = serve_batch_host(serve_batch)
    if jax.process_count() > 1:
        # shard_batch assembles the global array from per-process LOCAL
        # rows — feed only this process's slice of the utterance batch
        # (data-axis rows are laid out in process order).
        rows = serve_batch // jax.process_count()
        lo = jax.process_index() * rows
        ppg, lengths = ppg[lo:lo + rows], lengths[lo:lo + rows]
    placed = shard_batch(mesh, (ppg, lengths))
    from jax.sharding import NamedSharding, PartitionSpec as P

    out_sh = NamedSharding(mesh, P("data"))
    audio, mel_lens = jax.jit(serve, out_shardings=(out_sh, out_sh))(
        t2_params, t2_state, wg_params, placed[0], placed[1],
        jax.random.PRNGKey(9),
    )
    # assemble this process's rows host-side from addressable shards
    def gather(garr):
        out = np.zeros(garr.shape, garr.dtype)
        seen = np.zeros(serve_batch, bool)
        for shard in garr.addressable_shards:
            out[shard.index] = np.asarray(shard.data)
            seen[shard.index[0]] = True
        return out, seen

    audio_local, audio_seen = gather(audio)
    lens_local, _ = gather(mel_lens)
    return audio_local, lens_local, audio_seen


def flatten_params(params):
    """Flatten to host ndarrays.  Reconstructs each leaf from its
    ADDRESSABLE shards: with mesh rows = hosts, the TP specs ('model'
    axis only) leave every model shard locally present, so each process
    can rebuild full leaves without cross-process readback (np.asarray
    would raise on the non-fully-addressable TP-sharded leaves)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)

    def to_host(x):
        if not hasattr(x, "addressable_shards"):
            return np.asarray(x)
        if x.ndim == 0:
            return np.asarray(x.addressable_shards[0].data)
        out = np.zeros(x.shape, x.dtype)
        covered = np.zeros(x.shape, bool)
        for shard in x.addressable_shards:
            out[shard.index] = np.asarray(shard.data)
            covered[shard.index] = True
        assert covered.all(), "leaf not locally reconstructible"
        return out

    return [to_host(x) for x in leaves], str(treedef)


def main():
    process_id, num_processes, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax = setup_jax_cpu()
    from fac_via_ppg_tpu.scripts.multiproc import initialize_distributed

    initialize_distributed(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * N_LOCAL_DEVICES

    from fac_via_ppg_tpu.parallel.mesh import make_mesh

    # phase 1: DP train (data axis = all 4 devices)
    batcher = make_batcher(jax.process_index(), jax.process_count())
    params, losses = run_training(jax, list(batcher))
    leaves, treedef = flatten_params(params)

    # phase 2: DP x TP train — data axis crosses the process boundary,
    # model axis stays host-local (mesh rows = hosts)
    tp_batcher = make_batcher(
        jax.process_index(), jax.process_count(), d_in=TP_D_IN
    )
    tp_mesh = make_mesh(data=num_processes, model=N_LOCAL_DEVICES)
    tp_params, tp_losses = run_training(
        jax, list(tp_batcher), mesh=tp_mesh, tensor_parallel=True
    )
    tp_leaves, tp_treedef = flatten_params(tp_params)

    # phase 3: fused DP serving call across all processes (batch = one
    # row per device so any process count divides evenly)
    audio, mel_lens, seen = run_serving(
        jax, make_mesh(), serve_batch=jax.device_count()
    )

    # phase 4: preemption-guard allgather semantics
    # (train/preemption.should_stop): the exit decision is the OR of
    # every rank's flag — a notice on ANY single rank (here: rank 1
    # only, the single-VM-eviction case) must stop every process, and
    # the poll must be callable in lockstep (it is a collective).
    from fac_via_ppg_tpu.train.preemption import PreemptionGuard

    guard = PreemptionGuard(signals=())  # no handler: just the protocol
    votes = [guard.should_stop()]  # nobody requested -> False everywhere
    if jax.process_index() == 1:
        guard.request()
    votes.append(guard.should_stop())  # rank 1 only -> True everywhere

    np.savez(
        out_path,
        losses=np.array(losses),
        treedef=np.array(treedef),
        n_leaves=np.array(len(leaves)),
        tp_losses=np.array(tp_losses),
        tp_treedef=np.array(tp_treedef),
        tp_n_leaves=np.array(len(tp_leaves)),
        serve_audio=audio,
        serve_mel_lens=mel_lens,
        serve_seen=seen,
        preempt_votes=np.array(votes),
        **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
        **{f"tp_leaf_{i}": leaf for i, leaf in enumerate(tp_leaves)},
    )
    print(f"worker {process_id} done: losses={losses} tp={tp_losses}")


if __name__ == "__main__":
    main()
