"""Export a lagrangebench_tpu checkpoint to the reference haiku layout.

Converts a checkpoint directory written by this framework's Trainer into
the reference's (tumaer/lagrangebench) ``save_haiku`` on-disk format
(reference lagrangebench/utils.py:50-128), so a model trained here can be
evaluated by the reference's ``infer``/``load_haiku`` unchanged:

    python scripts/export_reference_ckp.py ckp/gns_rpf3d_xxx/best out_dir

Model name and ``num_mp_steps`` are read from the ``config.yaml`` the
runner stores alongside the checkpoint (pass ``--model``/``--mp-steps`` to
override, e.g. for a checkpoint dir moved away from its config).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckp_dir", help="framework checkpoint dir (or its best/)")
    ap.add_argument("out_dir", help="output dir for the reference layout")
    ap.add_argument("--model", default=None,
                    help="model name (default: from config.yaml)")
    ap.add_argument("--mp-steps", type=int, default=None,
                    help="num_mp_steps (default: from config.yaml)")
    args = ap.parse_args()

    from lagrangebench_tpu.checkpoint import load_checkpoint
    from lagrangebench_tpu.compat import save_reference_checkpoint
    from lagrangebench_tpu.config import load_yaml

    model, mp_steps = args.model, args.mp_steps
    if model is None or mp_steps is None:
        # the runner saves config.yaml in the run dir; best/ sits one below
        for cand in (args.ckp_dir, os.path.dirname(os.path.normpath(args.ckp_dir))):
            cfg_path = os.path.join(cand, "config.yaml")
            if os.path.exists(cfg_path):
                cfg = load_yaml(cfg_path)
                model = model or cfg.model.name
                mp_steps = mp_steps or int(cfg.model.num_mp_steps)
                break
        else:
            ap.error("no config.yaml found near the checkpoint; "
                     "pass --model and --mp-steps")

    params, _, _, step = load_checkpoint(args.ckp_dir)
    import json

    loss = 0.0
    meta_path = os.path.join(args.ckp_dir, "metadata_ckp.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            loss = json.load(f).get("loss") or 0.0
    save_reference_checkpoint(
        args.out_dir, model, params, {"num_mp_steps": mp_steps},
        step=step, loss=loss,
    )


if __name__ == "__main__":
    main()
