"""Training / inference drivers for the three workloads: gatys, fast, video."""
