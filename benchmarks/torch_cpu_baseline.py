"""Measure the reference-equivalent PyTorch-CPU throughput for the BASELINE
north star: 720p frames/sec at 8x interpolation.

Builds the reference architecture with plain torch modules (same topology as
scripts/models/flow_computation.py / flow_interpolation.py — CONV bottleneck,
cross-stage skip) and times the reference eval protocol: stage-1 + 7 separate
full stage-2 forwards per pair (one per t, as in
evaluate_interpolation_results.py:234-242) on a padded 736x1280 frame pair.

Writes benchmarks/torch_cpu_baseline.json consumed by bench.py's
``vs_baseline``. Run once per machine:

    python benchmarks/torch_cpu_baseline.py
"""

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def conv_block(cin, cout, k):
    return nn.Sequential(nn.Conv2d(cin, cout, k, padding=k // 2), nn.LeakyReLU(0.1))


class UNet(nn.Module):
    def __init__(self, in_ch, out_ch, cross_in=False, cross_out=False):
        super().__init__()
        self.cross_in, self.cross_out = cross_in, cross_out
        chans = [(32, 7), (64, 5), (128, 3), (256, 3), (512, 3)]
        c = in_ch
        self.enc = nn.ModuleList()
        for f, k in chans:
            self.enc.append(nn.Sequential(conv_block(c, f, k), conv_block(f, f, k)))
            c = f
        self.bott = nn.Sequential(conv_block(512, 512, 3), conv_block(512, 512, 3))
        c7 = 1024 if cross_in else 512
        self.dec = nn.ModuleList([
            nn.Sequential(conv_block(c7, 512, 3), conv_block(512, 512, 3)),
            nn.Sequential(conv_block(1024, 256, 3), conv_block(256, 256, 3)),
            nn.Sequential(conv_block(512, 128, 3), conv_block(128, 128, 3)),
            nn.Sequential(conv_block(256, 64, 3), conv_block(64, 64, 3)),
            nn.Sequential(conv_block(128, 32, 3), conv_block(32, 32, 3)),
        ])
        self.fuse = conv_block(64, 32, 3)
        self.final = nn.Conv2d(32, out_ch, 3, padding=1)

    def forward(self, x, cross=None):
        skips = []
        h = x
        for i, block in enumerate(self.enc):
            if i > 0:
                h = F.avg_pool2d(h, 2)
            h = block(h)
            skips.append(h)
        h = self.bott(F.avg_pool2d(h, 2))
        enc = h
        if self.cross_in:
            h = torch.cat([h, cross], 1)
        up = lambda z: F.interpolate(z, scale_factor=2, mode="bilinear")
        h = self.dec[0](up(h))
        for blk, sk in zip(self.dec[1:], reversed(skips[1:])):
            h = blk(up(torch.cat([h, sk], 1)))
        h = self.fuse(torch.cat([h, skips[0]], 1))
        return self.final(h), enc


def warp(x, flo):
    B, C, H, W = x.shape
    xx = torch.arange(W).view(1, -1).expand(H, -1)
    yy = torch.arange(H).view(-1, 1).expand(-1, W)
    grid = torch.stack([xx, yy]).float()[None].expand(B, -1, -1, -1)
    v = grid + flo
    u = 2 * v[:, 0] / max(W - 1, 1) - 1
    w = 2 * v[:, 1] / max(H - 1, 1) - 1
    return F.grid_sample(x, torch.stack([u, w], 3), align_corners=True)


@torch.no_grad()
def run(H=736, W=1280, n_t=7, iters=3):
    torch.set_num_threads(os.cpu_count())
    s1 = UNet(6, 4, cross_out=True).eval()
    s2 = UNet(16, 5, cross_in=True).eval()
    pair = torch.randn(1, 6, H, W)

    def one_pair():
        flow, enc = s1(pair)
        f01, f10 = flow[:, :2], flow[:, 2:]
        img0, img1 = pair[:, :3], pair[:, 3:]
        for k in range(1, n_t + 1):
            t = k / (n_t + 1)
            ft0 = -(1 - t) * t * f01 + t * t * f10
            ft1 = (1 - t) ** 2 * f01 - t * (1 - t) * f10
            inp = torch.cat([img1, warp(img1, ft1), ft1, ft0, warp(img0, ft0), img0], 1)
            out, _ = s2(inp, enc)
            v1 = torch.sigmoid(out[:, :1])
            v0 = 1 - v1
            p0 = warp(img0, ft0 + out[:, 3:5]) * v0
            p1 = warp(img1, ft1 + out[:, 1:3]) * v1
            _ = ((1 - t) * p0 + t * p1) / ((1 - t) * v0 + t * v1)

    one_pair()  # warmup
    t0 = time.time()
    for _ in range(iters):
        one_pair()
    dt = (time.time() - t0) / iters
    fps = n_t / dt
    return {"fps_720p_8x_cpu": fps, "sec_per_pair": dt, "threads": torch.get_num_threads()}


if __name__ == "__main__":
    res = run()
    out = os.path.join(os.path.dirname(__file__), "torch_cpu_baseline.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
