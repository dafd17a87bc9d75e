"""Utilities: logging, image/video IO, TensorBoard writing, configuration."""
