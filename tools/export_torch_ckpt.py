"""Export one of OUR checkpoints as a reference-compatible torch .pth.

The inverse of the import shim (r2dm_tpu/utils/torch_import.py): models
trained in this framework become loadable by the reference repo's
``utils.inference.setup_model`` / ``torch.hub`` surface (reference
hubconf.py:17-41, train.py:294-304 checkpoint layout), so users can move in
BOTH directions — validate our training runs inside the reference's own
eval harness, or serve reference-side.

The emitted ``weights`` / ``ema_weights`` contain every translated
parameter plus the ``coords`` buffer; constants the reference re-registers
at construction (FIR kernels, residual ``scale``, coord-encoding tables,
``_dummy``) are omitted — the reference must load with ``strict=False``
(its ``setup_model`` constructs the net from ``cfg`` first, so those
buffers already hold the right values; asserted by
tests/test_torch_export.py against the live reference net).

Usage: python tools/export_torch_ckpt.py checkpoint.msgpack out.pth
(both the raw-training and EMA lanes are translated; the reference serves
ema_weights by default — utils/inference.py:80-81)
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="our .msgpack checkpoint")
    p.add_argument("out", help="output .pth path")
    args = p.parse_args(argv)

    import torch

    from r2dm_tpu.checkpoint import load_checkpoint
    from r2dm_tpu.utils.torch_import import (
        export_refinenet_state_dict,
        export_unet_state_dict,
    )

    ckpt = load_checkpoint(args.ckpt)
    arch = ckpt["cfg"].get("model", {}).get("architecture", "efficient_unet")
    export = (
        export_refinenet_state_dict if arch == "refinenet"
        else export_unet_state_dict
    )

    def to_torch(tree):
        return {
            # copy: msgpack arrays are read-only views, torch wants writable
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in export(tree).items()
        }

    # both lanes translate independently — the reference reads ema_weights
    # for inference (utils/inference.py:80-81) and weights to keep training
    weights = to_torch(ckpt["weights"])
    out = {
        "cfg": ckpt["cfg"],
        "weights": weights,
        "ema_weights": (
            to_torch(ckpt["ema_weights"]) if ckpt.get("ema_weights") else weights
        ),
        "global_step": ckpt.get("global_step", 0),
    }
    torch.save(out, args.out)
    print(
        f"wrote {args.out}: {len(weights)} tensors/lane, "
        f"step {out['global_step']}"
    )


if __name__ == "__main__":
    main()
