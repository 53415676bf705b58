"""Multi-host training launcher.

The reference spawns one training subprocess per GPU with --rank/--n_gpus
flags rendezvousing over a NCCL TCP URL (src/common/multiproc.py:38-55,
src/waveglow/distributed.py:145-170).  On TPU there is no per-device
process: a single JAX process drives every chip on its host, and XLA
compiles the collectives onto ICI.  Multi-HOST jobs (pods/slices) need one
process per host initialized through `jax.distributed.initialize`, which
this launcher wraps:

  python -m fac_via_ppg_tpu.scripts.multiproc \
      --coordinator HOST:PORT --num_processes N --process_id I \
      train_ppg2mel output_directory=... training_files=...

On Cloud TPU the coordinator/process arguments are auto-detected from the
environment and may be omitted.  For the common single-host case just run
the trainers directly.
"""

from __future__ import annotations

import argparse
import sys


def initialize_distributed(coordinator=None, num_processes=None,
                           process_id=None):
    """Join (or form) the multi-process JAX runtime.

    With explicit arguments this rendezvouses at coordinator HOST:PORT;
    with none it lets Cloud TPU auto-detection take over, degrading to a
    plain single-process run where there is nothing to detect.  Replaces
    the reference's per-GPU NCCL TCP rendezvous (distributed.py:145-170).
    """
    import jax

    if coordinator or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # Cloud TPU: everything auto-detected; no-op on single host.
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run

    print(
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"local devices: {jax.local_device_count()}, "
        f"global devices: {jax.device_count()}"
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address HOST:PORT (auto on Cloud TPU)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("trainer", choices=["train_ppg2mel", "train_waveglow"])
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )

    overrides = {}
    for arg in args.overrides:
        k, _, v = arg.partition("=")
        try:
            import ast

            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v

    if args.trainer == "train_ppg2mel":
        from fac_via_ppg_tpu.scripts.train_ppg2mel import main as train_main

        train_main(**overrides)
    else:
        from fac_via_ppg_tpu.scripts.train_waveglow import main as train_main

        config = overrides.pop("config", None)
        if config:
            train_main(config, **overrides)
        else:
            train_main(**overrides)


if __name__ == "__main__":
    main()
