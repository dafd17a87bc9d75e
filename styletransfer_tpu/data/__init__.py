"""Datasets and input pipeline: COCO images, sample videos, downloaders,
and host->device prefetch."""
