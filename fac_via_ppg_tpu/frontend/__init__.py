from fac_via_ppg_tpu.frontend import feat, kaldi_io, mfcc, nnet3, ppg
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG, get_ppg
