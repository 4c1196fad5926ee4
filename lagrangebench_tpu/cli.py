"""Console entry point: lagrangebench-tpu config=configs/rpf_2d/gns.yaml [k=v ...]

Config priority: CLI dotlist > YAML `extends:` chain > built-in defaults
(same three-level scheme as the reference, reference main.py:17-77).
Restarting from a checkpoint: lagrangebench-tpu load_ckp=ckp/<run> reuses
the run's saved config.yaml. `python main.py ...` from a checkout is the
same function.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    from .config import check_subset, from_dotlist, load_with_extends, merge
    from .defaults import defaults

    argv = argv if argv is not None else sys.argv[1:]
    cli = from_dotlist(argv)

    if cli.get("config") is not None:
        config_path = cli.config
    elif cli.get("load_ckp") is not None:
        config_path = os.path.join(cli.load_ckp, "config.yaml")
    else:
        raise ValueError("Either config=... or load_ckp=... must be specified.")

    cfg_yaml = load_with_extends(config_path, defaults)
    check_subset(defaults, cli)
    cfg = merge(cfg_yaml, cli)

    if cfg.get("config") is None:
        cfg.config = config_path

    # hardware knobs must land in the environment before jax initializes
    # (reference main.py:56-64 parity; harmless on TPU)
    if cfg.get("gpu") is not None:
        os.environ["CUDA_VISIBLE_DEVICES"] = str(cfg.gpu)
        if cfg.gpu == -1:
            os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if cfg.get("xla_mem_fraction") is not None:
        os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] = str(cfg.xla_mem_fraction)

    from .runner import train_or_infer

    return train_or_infer(cfg)


if __name__ == "__main__":
    main()
