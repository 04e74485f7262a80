"""Convert reference PyTorch checkpoints to the native format.

    python -m superslomo_tpu.cli.convert_checkpoint superslomo.pt out_dir/
    python -m superslomo_tpu.cli.convert_checkpoint --vgg16 vgg16.pth vgg16.npz
"""

from __future__ import annotations

from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("src", help="Input .pt/.pth")
    parser.add_argument("dst", help="Output checkpoint dir (or .npz for --vgg16)")
    parser.add_argument("--vgg16", action="store_true",
                        help="Convert a torchvision vgg16 state_dict instead.")
    args = parser.parse_args()

    from superslomo_tpu.training import checkpoint as ckpt

    if args.vgg16:
        out = ckpt.convert_vgg16_state_dict(args.src, args.dst)
        print(f"wrote {out}")
        return
    params = ckpt.convert_torch_checkpoint(args.src)
    # wrap single stages so save_checkpoint's layout holds
    tree = params["params"]
    full = {"params": {"stage1": tree.get("stage1", {}), "stage2": tree.get("stage2", {})}}
    ckpt.save_checkpoint(args.dst, full, meta={"source": args.src})
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
