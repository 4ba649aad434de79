"""Deterministic scaled image-media corpus for the ddm1/ddm2 decades.

The registered ddm1/ddm2 fixture is 14 planted images — right for the
exact-oracle gate, useless for a scale measurement. This derives an
n-image corpus from the SAME closed-form pixel generator (ddm1's
squared-mod recipe without the %100 fold, so every base is distinct at
any n) into a gitignored parquet cache, OUTSIDE the bench timing
window (bench.py pre-generates in section setup, like make_sf1):

- ids ``0 .. n_base-1``: distinct base images (36x32, 9x8 tile grid);
- ids ``1_000_000 + i`` for i < n_base//10: brightness copies of base
  i (+10 uniform — dHash hamming 0, the re-encode analogue);
- ids ``2_000_000 + i`` for i < n_base//10: single-tile edits of base
  i (+50 on tile row 3, col 4 — flips at most the touched comparisons).

So the planted near-dup pair count scales WITH the corpus (n/5 pairs)
while pair density stays constant — the banded join's candidate volume
grows linearly, which is the claim the decade measurement checks.

BMP payload bytes are assembled with numpy (this is a data generator,
not the engine codec path); a self-check decodes one sample through
the ENGINE's decode_bmp and compares every byte to the closed form.
A _READY marker gates readers against partial output.
"""

from __future__ import annotations

import os

W, H = 36, 32
BRIGHT_BASE = 1_000_000
EDIT_BASE = 2_000_000

# bump on ANY generator change: the _READY marker embeds this, so a
# stale cache regenerates instead of silently serving data from an
# older recipe (this generator has already been fixed twice — the
# periodic first cut would still be served today by an unversioned
# marker)
GENERATOR_VERSION = 3


def _pixels(media_id: int) -> "np.ndarray":
    """(H, W, 3) uint8 from the closed-form generator. ddm1's
    squared-mod recipe is fine for 14 fixture ids but PERIODIC in the
    base id (any f(offset(base) + g(y,x,c)) % 199 yields <= 199
    distinct images — a first cut of this corpus hit that: every
    199th base identical, 356k phantom dup pairs at n=10k), and even
    a per-ROW phase mix leaves a fat hamming tail (32 rows drawn from
    only 199 possible row patterns share whole tile-rows often —
    measured 0.18% of pairs within hamming 8, including full
    collisions), and ANY
    (linear phase)^2 % m recipe collapses the same way because the
    final mod only sees the phase's residue — so the square is
    integer-DIVIDED before the mod ((e*e) // 1009 % 199), which
    depends on the full magnitude of e, not its residue class: pixel
    values become iid-ish draws, tile grays sums of 48 of them,
    gradient signs coin flips, and accidental hamming <= 8 of 64
    lands at the binomial ~2e-10 — while the planted brightness/edit
    relations stay exactly ddm1's (uniform offsets and single-tile
    bumps are applied after the mix)."""
    import numpy as np

    base = media_id % BRIGHT_BASE
    y = np.arange(H).reshape(H, 1, 1)
    x = np.arange(W).reshape(1, W, 1)
    c = np.arange(3).reshape(1, 1, 3)
    e = (base * 48271 + y * 16807 + x * 69621 + c * 9973 + 5) % 2147483647
    v = ((e * e) // 1009) % 199
    if BRIGHT_BASE <= media_id < EDIT_BASE:
        v = v + 10
    elif media_id >= EDIT_BASE:
        tile = np.zeros((H, W, 1), dtype=np.int64)
        tile[12:16, 16:20] = 50  # tile row 3, col 4 (4x4 patches)
        v = v + tile
    return v.astype(np.uint8)


def _bmp(px: "np.ndarray") -> bytes:
    """24-bit BI_RGB bottom-up BMP, byte-identical to the engine's
    encode_bmp, assembled with numpy."""
    import struct

    import numpy as np

    stride = (3 * W + 3) & ~3
    rows = px[::-1, :, ::-1].reshape(H, 3 * W)  # bottom-up, BGR
    body = np.zeros((H, stride), dtype=np.uint8)
    body[:, : 3 * W] = rows
    raw = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raw), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(raw), 2835, 2835, 0, 0
    )
    return header + raw


def media_ids(n_base: int) -> list[int]:
    plant = n_base // 10
    return (
        list(range(n_base))
        + [BRIGHT_BASE + i for i in range(plant)]
        + [EDIT_BASE + i for i in range(plant)]
    )


def make_media(n_base: int, out_dir: str) -> str:
    """Write the n_base-scaled media corpus to ``out_dir`` (cached:
    returns immediately when the _READY marker exists)."""
    os.makedirs(out_dir, exist_ok=True)
    ready = os.path.join(out_dir, "_READY")
    path = os.path.join(out_dir, "media.parquet")
    stamp = f"v{GENERATOR_VERSION} n_base={n_base} ids={len(media_ids(n_base))}"
    if os.path.exists(ready):
        try:
            with open(ready) as f:
                if f.read().strip() == stamp:
                    return path
        except OSError:
            pass
        # stale or unreadable marker: regenerate below

    import pyarrow as pa
    import pyarrow.parquet as pq

    # self-check: the numpy BMP must round-trip through the ENGINE
    # codec to the closed-form pixels (guards generator/codec drift)
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lakerunner_spark.dataops.multimodal import decode_bmp

    probe = _pixels(BRIGHT_BASE)
    w, h, ch, samples = decode_bmp(_bmp(probe))
    assert (w, h, ch) == (W, H, 3) and samples == probe.tobytes()

    ids = media_ids(n_base)
    payloads = [_bmp(_pixels(m)) for m in ids]
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids)),
            "width": pa.array([W] * len(ids), pa.int32()),
            "height": pa.array([H] * len(ids), pa.int32()),
            "duration_ms": pa.array([None] * len(ids), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pq.write_table(table, path, compression="zstd")
    with open(ready, "w") as f:
        f.write(stamp)
    return path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else f".localdata/media_{n}"
    print(make_media(n, out))
