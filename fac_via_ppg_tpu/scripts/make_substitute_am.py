"""Generate the substitute PPG resource bundle under data/.

The reference ships its acoustic model as a git-LFS blob that is absent from
the mount (`data/am/final.raw` is listed in .MISSING_LARGE_BLOBS), so the
PPG path cannot be exercised against the original weights.  This script
creates a structurally-equivalent bundle with the same shapes and formats:

  data/am/final.raw.txt   random 40-in / 5816-senone softmax TDNN (nnet3 text)
  data/feats/final.mat    random orthonormal 40x91 LDA (Kaldi binary matrix)
  data/feats/reduce_dim.mat  40x5816 one-hot senone->monophone map
                             (Kaldi binary sparse matrix; sum == 5816)
  data/feats/splice_opts  "--left-context=3 --right-context=3"
  data/arpa_phonemes      40-symbol ARPABET table

Usage: python -m fac_via_ppg_tpu.scripts.make_substitute_am [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

from fac_via_ppg_tpu.frontend import kaldi_io, nnet3

ARPABET = [
    "aa", "ae", "ah", "ao", "aw", "ay", "b", "ch", "d", "dh", "eh", "er",
    "ey", "f", "g", "hh", "ih", "iy", "jh", "k", "l", "m", "n", "ng", "ow",
    "oy", "p", "r", "s", "sh", "t", "th", "uh", "uw", "v", "w", "y", "z",
    "zh", "sil",
]


def make_bundle(out_dir: str, n_senones: int = 5816, n_phones: int = 40,
                hidden_dim: int = 256, num_layers: int = 3, seed: int = 16807):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out_dir, "am"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "feats"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "filelists"), exist_ok=True)

    net = nnet3.make_random_tdnn(
        input_dim=40, output_dim=n_senones, hidden_dim=hidden_dim,
        num_layers=num_layers, seed=seed,
    )
    nnet3.write_nnet3_text(net, os.path.join(out_dir, "am", "final.raw.txt"))

    # LDA-like 40x91 projection: orthonormal rows over the 91-dim spliced
    # MFCC space (13 ceps x 7 context frames), like the real final.mat.
    q, _ = np.linalg.qr(rng.randn(91, 40))
    kaldi_io.write_matrix(
        os.path.join(out_dir, "feats", "final.mat"),
        q.T.astype(np.float32),
    )

    # Senone->monophone map: every senone assigned to exactly one phone.
    assign = rng.randint(0, n_phones, size=n_senones)
    assign[:n_phones] = np.arange(n_phones)  # ensure every phone non-empty
    reduce_dim = np.zeros((n_phones, n_senones), dtype=np.float32)
    reduce_dim[assign, np.arange(n_senones)] = 1.0
    kaldi_io.write_sparse_matrix(
        os.path.join(out_dir, "feats", "reduce_dim.mat"), reduce_dim
    )

    with open(os.path.join(out_dir, "feats", "splice_opts"), "w") as f:
        f.write("--left-context=3 --right-context=3")

    with open(os.path.join(out_dir, "arpa_phonemes"), "w") as f:
        for i, phone in enumerate(ARPABET):
            f.write(f"{phone}\t{i}\n")

    # Position-dependent phone table (like data/am/phones.txt): eps +
    # silence variants + 4 word-position variants per non-sil phone.
    with open(os.path.join(out_dir, "am", "phones.txt"), "w") as f:
        idx = 0
        f.write(f"<eps> {idx}\n"); idx += 1
        for sil in ("sil", "sil_B", "sil_E", "sil_I", "sil_S"):
            f.write(f"{sil.upper()} {idx}\n"); idx += 1
        for phone in ARPABET[:-1]:
            for pos in ("B", "E", "I", "S"):
                f.write(f"{phone.upper()}_{pos} {idx}\n"); idx += 1


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "data"
    )
    out = sys.argv[1] if len(sys.argv) > 1 else default
    make_bundle(os.path.abspath(out))
    print(f"Substitute PPG bundle written to {os.path.abspath(out)}")
