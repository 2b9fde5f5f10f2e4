"""Command-line entry points mirroring the reference's heart_main / LiTS_main."""
