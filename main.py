"""CLI entry point: python main.py config=configs/rpf_2d/gns.yaml [k=v ...]

Thin shim over :mod:`lagrangebench_tpu.cli` (the installed console script
``lagrangebench-tpu``), kept so checkout users can run the CLI without
installing — mirrors the reference's top-level main.py.
"""

from lagrangebench_tpu.cli import main

if __name__ == "__main__":
    main()
