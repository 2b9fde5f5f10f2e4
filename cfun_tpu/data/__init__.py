"""Host-side data subsystem: NIfTI IO, resampling, datasets, async feeder."""
