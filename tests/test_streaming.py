"""Streaming pipeline unit test on the CPU mesh with tiny models."""

import numpy as np
import pytest
from scipy.io import wavfile

import jax

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.eval.streaming import StreamingAccentConverter
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.models.waveglow import init_waveglow, remove_weightnorm
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle


def test_streaming_pipeline(tmp_path, rng):
    # tiny corpus
    wavs = []
    for i in range(2):
        t = np.arange(4800) / 16000.0
        wav = (np.sin(2 * np.pi * 200 * t) * 9000).astype(np.int16)
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000, wav)
        wavs.append(p)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )

    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    for fused in (False, True):
        converter = StreamingAccentConverter(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            denoiser_strength=0.005, fused=fused,
        )
        results = list(converter.run(wavs))
        assert len(results) == 2
        for r in results:
            assert r.audio.ndim == 1 and len(r.audio) > 0
            assert np.isfinite(r.audio).all()
            assert r.audio_seconds > 0 and r.wall_seconds > 0
            assert r.latency_seconds >= r.wall_seconds - 1e-6


def test_streaming_micro_batched(tmp_path, rng):
    """Micro-batched fused streaming (batch_size=3 over 5 utts: one full
    batch + a padded partial flush), multi-threaded front end."""
    wavs = []
    for i in range(5):
        t = np.arange(4800 + 320 * i) / 16000.0
        wav = (np.sin(2 * np.pi * (180 + 30 * i) * t) * 9000).astype(np.int16)
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000, wav)
        wavs.append(p)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    converter = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        denoiser_strength=0.005, fused=True, batch_size=3,
        frontend_threads=2,
    )
    results = list(converter.run(wavs))
    assert len(results) == 5
    assert sorted(r.wav_path for r in results) == sorted(wavs)
    for r in results:
        assert r.audio.ndim == 1 and len(r.audio) > 0
        assert np.isfinite(r.audio).all()
        assert r.audio_seconds > 0 and r.wall_seconds > 0
        assert r.latency_seconds >= r.wall_seconds - 1e-6

    # guard: micro-batching requires the fused path
    with pytest.raises(ValueError):
        StreamingAccentConverter(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            fused=False, batch_size=2,
        )


def test_streaming_prewarm_is_transparent(tmp_path, rng):
    """prewarm() compiles the fused program ahead of serving (so latency
    benchmarks don't count compilation) without changing served audio."""
    wavs = []
    for i in range(3):
        t = np.arange(4800) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * (200 + 20 * i) * t) * 9000)
                      .astype(np.int16))
        wavs.append(p)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    def build():
        return StreamingAccentConverter(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            denoiser_strength=0.005, fused=True, batch_size=3,
        )

    cold = build()
    baseline = {r.wav_path: r.audio
                for r in cold.run(wavs, key=jax.random.PRNGKey(7))}

    warm = build()
    warm.prewarm(utt_seconds=0.3)  # dummy batch; output discarded
    for r in warm.run(wavs, key=jax.random.PRNGKey(7)):
        np.testing.assert_array_equal(r.audio, baseline[r.wav_path])

    # staged (non-fused) path: documented no-op
    staged = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        denoiser_strength=0.005, fused=False,
    )
    staged.prewarm()


def test_streaming_pipeline_depth_is_transparent(tmp_path, rng):
    """Overlapped micro-batches (pipeline_depth > 1) must serve exactly
    the same audio in the same order as the synchronous depth-1 loop:
    the launch order (and so the PRNG split order) is depth-invariant."""
    wavs = []
    for i in range(7):
        t = np.arange(4800 + 160 * i) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * (190 + 25 * i) * t) * 9000)
                      .astype(np.int16))
        wavs.append(p)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    def run(depth):
        conv = StreamingAccentConverter(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            denoiser_strength=0.005, fused=True, batch_size=2,
            pipeline_depth=depth,
        )
        return list(conv.run(wavs, key=jax.random.PRNGKey(11)))

    sync = run(1)
    assert [r.wav_path for r in sync] == wavs  # 3 full batches + partial
    for depth in (2, 3):
        piped = run(depth)
        assert [r.wav_path for r in piped] == wavs
        for a, b in zip(sync, piped):
            np.testing.assert_array_equal(a.audio, b.audio)
            assert b.latency_seconds >= b.wall_seconds - 1e-6


def test_streaming_error_isolation(tmp_path, rng):
    """A malformed utterance must not take down the stream: with
    on_error='skip' it yields an error-annotated empty result while
    every other utterance is served (micro-batched fused path, where a
    poisoned batch would be worst); the default on_error='raise'
    surfaces the failure as an exception naming the bad file."""
    wavs = []
    for i in range(5):
        t = np.arange(4800) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * (200 + 20 * i) * t) * 9000)
                      .astype(np.int16))
        wavs.append(p)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a RIFF file")
    wavs.insert(2, bad)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    def build(on_error):
        return StreamingAccentConverter(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            denoiser_strength=0.005, fused=True, batch_size=2,
            on_error=on_error,
        )

    results = list(build("skip").run(wavs))
    assert len(results) == 6
    failed = [r for r in results if r.error is not None]
    assert len(failed) == 1 and failed[0].wav_path == bad
    assert failed[0].audio.size == 0
    for r in results:
        if r.error is None:
            assert r.audio.size > 0 and np.isfinite(r.audio).all()

    with pytest.raises(RuntimeError, match="bad.wav"):
        list(build("raise").run(wavs))

    with pytest.raises(ValueError):
        build("typo")


def test_streaming_source_is_lazy(tmp_path, rng):
    """A generator source must not be drained up front: production stays
    bounded by the queue depths while results stream out."""
    wavs = []
    for i in range(10):
        t = np.arange(4800) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * 200 * t) * 9000).astype(np.int16))
        wavs.append(p)

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    produced = []

    def live_source():
        for p in wavs:
            produced.append(p)
            yield p

    converter = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        denoiser_strength=0.0, fused=True, queue_depth=2,
    )
    gen = converter.run(live_source())
    first = next(gen)
    assert first.audio.size > 0
    # queue bounds: path_q(2) + in-flight worker(1) + feat_q(2) + the
    # consumed one — far fewer than the full 10
    assert len(produced) <= 8, (
        f"source drained eagerly: {len(produced)}/10 produced after one "
        f"result"
    )
    rest = list(gen)
    assert len(rest) == 9 and len(produced) == 10


def test_off_grid_batch_size_warns(tmp_path):
    """An off-tile-grid micro-batch (measured 1.6-1.9x slower than both
    neighbors — docs/PERF.md serving frontier, the B=12 crater) warns at
    construction; grid sizes don't."""
    import warnings

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" /
                            "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" /
                             "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=8,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(
        init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    )
    for b, pad, expect in ((12, True, True), (8, True, False),
                           (12, False, True)):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            conv = StreamingAccentConverter(
                t2_cfg, t2_params, t2_state, wg_cfg, wg_params,
                deps=deps, fused=True, batch_size=b, pad_to_grid=pad,
            )
        assert conv.fused.pad_to_grid is pad
        hit = any("tile grid" in str(w.message) for w in rec)
        assert hit == expect, (b, [str(w.message) for w in rec])
        if expect and pad:
            # the warning documents the mitigation: micro-batches are
            # auto-padded up to the grid (12 -> 16) on the device
            assert any("auto-padded to 16" in str(w.message) for w in rec)
        elif expect:
            # opt-out plumbed through: the warning says the off-grid
            # program runs as-is
            assert any("pad_to_grid=False" in str(w.message) for w in rec)
