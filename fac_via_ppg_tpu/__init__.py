"""fac_via_ppg_tpu: a TPU-native accent-conversion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
guanlongzhao/fac-via-ppg (Interspeech 2019): a foreign-accent-conversion
pipeline composed of

  1. a Kaldi-convention acoustic front-end + TDNN acoustic model that maps
     16 kHz speech to phonetic posteriorgrams (PPGs)      -> `frontend/`
  2. a Tacotron2-style PPG->mel seq2seq model              -> `models/tacotron2`
  3. a WaveGlow normalizing-flow vocoder (mel->waveform)   -> `models/waveglow`

Everything on the compute path is functional JAX compiled by XLA onto the
TPU MXU; sequence recurrences are `lax.scan`s; multi-chip scaling uses
`jax.sharding.Mesh` + ICI collectives instead of NCCL process groups.

Public surface mirrors the reference (SURVEY.md section 7):
`scripts/train_ppg2mel.py`, `scripts/train_waveglow.py`,
`scripts/generate_synthesis.py`, `configs/hparams.py`.
"""

__version__ = "0.1.0"
