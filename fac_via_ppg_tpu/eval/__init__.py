from fac_via_ppg_tpu.eval.parity import mel_mse, run_parity, teacher_forced_mel
from fac_via_ppg_tpu.eval.rtf import (
    tacotron2_decoder_throughput,
    waveglow_rtf,
)
