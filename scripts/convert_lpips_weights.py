"""Convert pretrained LPIPS(VGG-16) weights to the npz layout our JAX LPIPS
loads (nersemble_tpu/utils/lpips.py).

Run on a machine WITH torchvision + the ``lpips`` package (this image has
neither — no egress):

    python scripts/convert_lpips_weights.py --out lpips_vgg.npz
    export NERSEMBLE_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz

Keys written:
- ``features.<i>.weight`` / ``features.<i>.bias`` for every VGG-16 conv
  index i in torchvision's ``vgg16().features`` numbering (OIHW f32).
- ``lin<k>.model.1.weight`` for the 5 LPIPS linear heads ([1, C, 1, 1] f32),
  matching the ``lpips`` package's ``lins.<k>.model.1.weight`` state dict.

The reference meters LPIPS through torchmetrics' LPIPS(net_type='vgg')
(reference: nersemble_instant_ngp.py:160,448), which wraps the same ``lpips``
package weights.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import numpy as np
    import lpips as lpips_pkg  # pip install lpips
    import torchvision

    out = {}
    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1).features
    for i, mod in enumerate(vgg):
        if hasattr(mod, "weight") and mod.weight is not None:
            out[f"features.{i}.weight"] = mod.weight.detach().numpy()
            out[f"features.{i}.bias"] = mod.bias.detach().numpy()

    metric = lpips_pkg.LPIPS(net="vgg")
    for k, lin in enumerate(metric.lins):
        out[f"lin{k}.model.1.weight"] = \
            lin.model[1].weight.detach().numpy()

    np.savez(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
