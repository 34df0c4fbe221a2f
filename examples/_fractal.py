"""Shared fractal-placement recursion for fractal_spheres / fractal_teapots.

Parity with the `gen` recursion in /root/reference/examples/
fractal_spheres.rs and fractal_teapots.rs: a root shape at radius 1 spawns
six children at radius 2/5, displaced by 7/5 r along each axis, skipping the
direction that points straight back at the parent. Five levels yield
1 + 6 + 30 + 150 + 750 = 937 placements.
"""

LEVEL_COLORS = [0x264653, 0x2A9D8F, 0xE9C46A, 0xF4A261, 0xE76F51]


def fractal_placements(levels: int = 5):
    """Returns a list of per-level lists of (position, radius)."""
    out = [[] for _ in range(levels)]

    def gen(p, rad, depth, last_dir):
        out[depth].append((tuple(p), rad))
        if depth == levels - 1:
            return
        disp = rad * 7.0 / 5.0
        dirs = [
            (disp, 0.0, 0.0),
            (-disp, 0.0, 0.0),
            (0.0, disp, 0.0),
            (0.0, -disp, 0.0),
            (0.0, 0.0, disp),
            (0.0, 0.0, -disp),
        ]
        for i, dv in enumerate(dirs):
            if last_dir is None or i != (last_dir ^ 1):
                gen(
                    (p[0] + dv[0], p[1] + dv[1], p[2] + dv[2]),
                    rad * 2.0 / 5.0,
                    depth + 1,
                    i,
                )

    gen((0.0, 0.0, 0.0), 1.0, 0, None)
    return out
