"""Measure the reference's performance envelope on this machine (torch CPU).

The reference (tupini07/StyleTransfer) publishes no numbers (BASELINE.md), so
the comparison baseline is measured here: an independent torch transcription
of its architectures (same ops/shapes as network.py:204-611) run the way the
reference runs them — eager PyTorch on the single available CPU/GPU device.
torchvision is unavailable in this image, so VGG19 weights are random; the
*compute* is identical, which is what a throughput baseline needs.

Usage: ``python benchmarks/reference_baseline.py [--quick]`` — prints one
JSON dict with gatys iters/sec, fast_st img/sec (256px), and video
frames/sec, measured with a handful of iterations (torch CPU at these sizes
is seconds per step).
"""

from __future__ import annotations

import json
import sys
import time

import torch
import torch.nn as nn


def build_vgg_prefix() -> nn.Sequential:
    """VGG19 features up to conv3_1 — the slice the reference executes
    (network.py:366-398 stops at the deepest tap)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(128, 256, 3, padding=1),
    )


class ResidualBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1, padding_mode="reflect")
        self.insn1 = nn.InstanceNorm2d(c, affine=True)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(c, c, 3, padding=1, padding_mode="reflect")
        self.insn2 = nn.InstanceNorm2d(c, affine=True)

    def forward(self, x):
        out = self.relu(self.insn1(self.conv1(x)))
        out = self.conv2(out) + x
        return self.insn2(out)


def build_transform_net(in_channels=3) -> nn.Sequential:
    """The reference ImageTransformNet stack (network.py:520-611)."""
    return nn.Sequential(
        nn.Conv2d(in_channels, 32, 9, padding=4, padding_mode="reflect"),
        nn.InstanceNorm2d(32, affine=True), nn.ReLU(),
        nn.Conv2d(32, 64, 3, stride=2, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(64, affine=True), nn.ReLU(),
        nn.Conv2d(64, 128, 3, stride=2, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(128, affine=True), nn.ReLU(),
        *[ResidualBlock(128) for _ in range(5)],
        nn.Upsample(mode="nearest", scale_factor=2),
        nn.Conv2d(128, 64, 3, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(64, affine=True), nn.ReLU(),
        nn.Upsample(mode="nearest", scale_factor=2),
        nn.Conv2d(64, 32, 3, padding=1, padding_mode="reflect"),
        nn.InstanceNorm2d(32, affine=True), nn.ReLU(),
        nn.Conv2d(32, 3, 9, padding=4, padding_mode="reflect"),
    )


def gram(x):
    b, c, h, w = x.size()
    f = x.view(b, c, h * w)
    return torch.bmm(f, f.transpose(1, 2)) / (c * h * w)


def time_gatys(iters: int) -> float:
    """Gatys config: ~100 Adam iters over pixels at 256px (BASELINE.json)."""
    vgg = build_vgg_prefix().eval()
    content = torch.randn(1, 3, 256, 256)
    style = torch.randn(1, 3, 256, 256)
    tap_idx = [0, 2, 5, 7, 10]

    def taps(img):
        out, x = [], img
        for i, layer in enumerate(vgg):
            x = layer(x)
            if i in tap_idx:
                out.append(x)
        return out

    with torch.no_grad():
        style_grams = [gram(t) for t in taps(style)]
        content_tap = taps(content)[3]

    pixels = content.clone().requires_grad_()
    opt = torch.optim.Adam([pixels], lr=0.05)
    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        ts = taps(pixels)
        loss = sum(
            torch.nn.functional.mse_loss(gram(t), g.expand_as(gram(t)))
            for t, g in zip(ts, style_grams)
        ) * 100_000 + torch.nn.functional.mse_loss(ts[3], content_tap)
        loss.backward()
        opt.step()
    return iters / (time.perf_counter() - t0)


def time_fast_inference(iters: int, size: int = 256, batch: int = 4) -> float:
    net = build_transform_net().eval()
    x = torch.randn(batch, 3, size, size)
    with torch.no_grad():
        net(x)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            net(x)
    return iters * batch / (time.perf_counter() - t0)


def time_video(iters: int, size: int = 256) -> float:
    net = build_transform_net(in_channels=6).eval()
    frame = torch.randn(1, 3, size, size)
    old = frame.clone()
    with torch.no_grad():
        net(torch.cat([frame, old], dim=1))  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            old = net(torch.cat([frame, old], dim=1))
    return iters / (time.perf_counter() - t0)


def main():
    quick = "--quick" in sys.argv
    torch.manual_seed(0)
    n = 2 if quick else 5
    out = {
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "gatys_iters_per_sec": round(time_gatys(n), 3),
        "fast_st_images_per_sec_256px": round(time_fast_inference(n), 3),
        "fast_st_images_per_sec_512px": round(
            time_fast_inference(max(1, n // 2), size=512, batch=1), 3
        ),
        "video_frames_per_sec": round(time_video(n), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
