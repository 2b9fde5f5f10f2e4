"""Command-line entry points mirroring the reference's heart_main / LiTS_main."""

from typing import Optional, Tuple


def parse_mesh(spec: Optional[str]) -> Optional[Tuple[int, int]]:
    """'DATA[,SPACE]' -> (data, space) for ``train_model(mesh_spec=...)``.

    The reference has no distributed backend to mirror here (SURVEY.md
    s2.4); this flag is the TPU-native scale-out axis: DATA-way volume
    parallelism x SPACE-way spatial (H) sharding over a device mesh.
    """
    if not spec:
        return None
    parts = [int(p) for p in spec.split(",")]
    if len(parts) not in (1, 2) or any(p < 1 for p in parts):
        raise ValueError(f"--mesh expects DATA[,SPACE], got {spec!r}")
    return (parts[0], parts[1] if len(parts) == 2 else 1)
