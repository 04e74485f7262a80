"""Evaluation drivers (layer L4): interpolation PSNR/SSIM/IE, optical-flow
EPE, and the slow-motion visualizer."""
