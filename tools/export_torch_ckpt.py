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

Usage: python tools/export_torch_ckpt.py checkpoint.msgpack out.pth [--raw]
(default exports the EMA weights like the reference's inference default;
--raw exports the training weights instead)
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="our .msgpack checkpoint")
    p.add_argument("out", help="output .pth path")
    p.add_argument(
        "--raw", action="store_true",
        help="export the raw training weights (default: EMA weights, the "
        "reference inference default — utils/inference.py:80-81)",
    )
    args = p.parse_args(argv)

    import torch

    from r2dm_tpu.checkpoint import load_checkpoint
    from r2dm_tpu.utils.torch_import import (
        export_refinenet_state_dict,
        export_unet_state_dict,
    )

    ckpt = load_checkpoint(args.ckpt)
    weights = ckpt["weights"] if args.raw or not ckpt.get("ema_weights") else (
        ckpt["ema_weights"]
    )
    arch = ckpt["cfg"].get("model", {}).get("architecture", "efficient_unet")
    export = (
        export_refinenet_state_dict if arch == "refinenet"
        else export_unet_state_dict
    )
    sd = {
        # copy: msgpack-loaded arrays are read-only views, torch wants writable
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export(weights).items()
    }
    out = {
        "cfg": ckpt["cfg"],
        "weights": sd,
        "ema_weights": sd,
        "global_step": ckpt.get("global_step", 0),
    }
    torch.save(out, args.out)
    print(f"wrote {args.out}: {len(sd)} tensors, step {out['global_step']}")


if __name__ == "__main__":
    main()
