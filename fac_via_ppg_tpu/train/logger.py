"""TensorBoard loggers (reference src/common/logger.py:41-94).

tensorboardX is not in the image; torch's bundled SummaryWriter is, and
writes the same event-file format.
"""

from __future__ import annotations

import numpy as np

import jax

from torch.utils.tensorboard import SummaryWriter

from fac_via_ppg_tpu.train.plotting import (
    plot_alignment_to_numpy,
    plot_gate_outputs_to_numpy,
    plot_spectrogram_to_numpy,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class Tacotron2Logger(SummaryWriter):
    def __init__(self, logdir):
        super().__init__(logdir)

    def log_training(self, reduced_loss, grad_norm, learning_rate, duration,
                     iteration):
        self.add_scalar("training.loss", reduced_loss, iteration)
        self.add_scalar("grad.norm", grad_norm, iteration)
        self.add_scalar("learning.rate", learning_rate, iteration)
        self.add_scalar("duration", duration, iteration)

    def log_validation(self, reduced_loss, params, y, y_pred, iteration):
        self.add_scalar("validation.loss", reduced_loss, iteration)
        mel_outputs, mel_outputs_postnet, gate_outputs, alignments = y_pred
        mel_targets, gate_targets = y

        # per-parameter value histograms (reference logger.py:59-61)
        leaves, _ = jax.tree_util.tree_flatten_with_path(params)
        for path, value in leaves:
            tag = jax.tree_util.keystr(path).replace("'", "").strip("[]")
            self.add_histogram(tag, np.asarray(value), iteration)

        idx = np.random.randint(0, np.asarray(alignments).shape[0])
        self.add_image(
            "alignment",
            plot_alignment_to_numpy(np.asarray(alignments[idx]).T),
            iteration, dataformats="HWC",
        )
        self.add_image(
            "mel_target",
            plot_spectrogram_to_numpy(np.asarray(mel_targets[idx])),
            iteration, dataformats="HWC",
        )
        self.add_image(
            "mel_predicted",
            plot_spectrogram_to_numpy(np.asarray(mel_outputs_postnet[idx])),
            iteration, dataformats="HWC",
        )
        self.add_image(
            "mel_predicted_no_postnet",
            plot_spectrogram_to_numpy(np.asarray(mel_outputs[idx])),
            iteration, dataformats="HWC",
        )
        self.add_image(
            "gate",
            plot_gate_outputs_to_numpy(
                np.asarray(gate_targets[idx]),
                _sigmoid(np.asarray(gate_outputs[idx])),
            ),
            iteration, dataformats="HWC",
        )


class WaveglowLogger(SummaryWriter):
    def __init__(self, logdir):
        super().__init__(logdir)

    def log_training(self, reduced_loss, iteration):
        self.add_scalar("training.loss", reduced_loss, iteration)
