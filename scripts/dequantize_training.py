#!/usr/bin/env python
"""Convert a training checkpoint back to an inference model / plain
weights (reference: scripts/dequantize_sdnq_training.py:6-20).

Usage:
  python scripts/dequantize_training.py CKPT_DIR OUT_DIR [--full-precision]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="orbax checkpoint dir (a step_N dir)")
    ap.add_argument("out", help="output dir for safetensors")
    ap.add_argument("--full-precision", action="store_true",
                    help="dequantize everything to plain bf16 weights")
    args = ap.parse_args()

    # deferred imports keep --help fast
    from sdnq_tpu import dequantize_model
    from sdnq_tpu.io import restore_checkpoint, save_quantized
    from sdnq_tpu.train import convert_training_model_to_inference

    # restore without a template: orbax standard restore of raw pytree
    import orbax.checkpoint as ocp
    state = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
    params = state.get("params", state) if isinstance(state, dict) else state
    params = convert_training_model_to_inference(params)
    if args.full_precision:
        params = dequantize_model(params)
    save_quantized(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
