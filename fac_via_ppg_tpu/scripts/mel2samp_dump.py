"""Mel-spectrogram dump CLI (reference src/waveglow/mel2samp.py:119-147):
takes a directory/filelist of clean audio and writes mel .npy files —
useful for building vocoder test sets.

Usage:
  python -m fac_via_ppg_tpu.scripts.mel2samp_dump -f files.txt \
      -c config.json -o outdir
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from fac_via_ppg_tpu.configs import DEFAULT_WAVEGLOW_CONFIG_PATH
from fac_via_ppg_tpu.data.mel2samp import Mel2Samp, files_to_list
from fac_via_ppg_tpu.frontend import feat as feat_mod

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--filelist_path", required=True)
    parser.add_argument("-c", "--config", type=str,
                        default=DEFAULT_WAVEGLOW_CONFIG_PATH,
                        help="JSON file for configuration")
    parser.add_argument("-o", "--output_dir", type=str, required=True)
    args = parser.parse_args()

    with open(args.config) as f:
        data_config = json.loads(f.read())["data_config"]
    data_config["training_files"] = args.filelist_path
    mel2samp = Mel2Samp(**data_config)

    filepaths = files_to_list(args.filelist_path)
    os.makedirs(args.output_dir, exist_ok=True)

    for filepath in filepaths:
        fs, audio = feat_mod.read_wav(filepath)
        melspectrogram = mel2samp.get_mel(audio.astype(np.float32))
        filename = os.path.basename(filepath)
        new_filepath = os.path.join(args.output_dir, filename + ".npy")
        print(new_filepath)
        np.save(new_filepath, melspectrogram)
