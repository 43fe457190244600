"""Generate the golden enrichment fixture.

Builds a synthetic API-shaped JSON batch covering the tricky cases
(4- vs 6-char locators, upper/lower subsquare case, meridian pairs
tx_lon==rx_lon, identical grids, equator-adjacent, antipodal-ish,
band-table hits and misses, dyadic-tie latitudes) and runs the
*reference* script /root/reference/wsprnet_azi_calc.py on it to
record its exact output CSV. The committed fixture pair
(spots_input.json, spots_golden.csv) is the oracle for
tests/test_enrich_golden.py — reference code is the spec, never
imported or copied.

Run manually: python tests/golden/make_golden.py
"""

from __future__ import annotations

import json
import random
import subprocess
from pathlib import Path

HERE = Path(__file__).parent
REF = "/root/reference/wsprnet_azi_calc.py"

FIELDS = "ABCDEFGHIJKLMNOPQR"  # valid Maidenhead field letters


def rand_grid(rng: random.Random) -> str:
    g4 = (
        rng.choice(FIELDS)
        + rng.choice(FIELDS)
        + str(rng.randrange(10))
        + str(rng.randrange(10))
    )
    style = rng.randrange(4)
    if style == 0:
        return g4
    sub = rng.choice("abcdefghijklmnopqrstuvwx")
    sub2 = rng.choice("abcdefghijklmnopqrstuvwx")
    if style == 1:
        return g4 + sub + sub2
    if style == 2:
        return g4 + sub.upper() + sub2.upper()
    return g4 + sub + sub2.upper()  # mixed case pair


def main() -> None:
    rng = random.Random(20260813)
    band_keys = [0.1375, 0.4742, 1.8366, 3.5701, 5.2872, 5.3654, 7.0386,
                 10.1402, 14.0971, 18.1061, 21.0946, 24.9246, 28.1261,
                 50.2935, 70.0911, 144.4891, 432.3001, 1296.5001]
    spots = []
    special = [
        # (Grid, ReporterGrid) pairs for the vertex corner cases
        ("AA00", "AA00"),          # identical grids
        ("AA05aa", "AA05xx"),      # same lon field? (subsquare differs)
        ("JO01ab", "JO91ab"),      # exact meridian: same lon chars
        ("JN58tc", "JN58tc"),      # identical 6-char
        ("AR09ax", "SA90xa"),      # near-pole vs southern
        ("EM00aa", "OM00aa"),      # equator-adjacent pair
        ("AA00aa", "RR99xx"),      # extreme corners (antipodal-ish)
        ("KN07cc", "KN07CC"),      # lower vs upper same subsquare
        ("JJ00jc", "JJ00cj"),      # dyadic-tie latitudes (x.0625 steps)
        ("II55ll", "II55oo"),      # more dyadic ties
    ]
    n = 400
    spotnum = 100000
    for i in range(n):
        # strictly increasing with occasional gaps, like the real cursor
        spotnum += 1 if i % 11 else rng.randrange(2, 50)
        if i < len(special):
            grid, rgrid = special[i]
        else:
            grid, rgrid = rand_grid(rng), rand_grid(rng)
            if i % 17 == 0:
                rgrid = grid  # same-grid spots sprinkled in
            if i % 13 == 0:
                # meridian: force identical lon characters (indices 0, 2, 4)
                rgrid = grid[0] + rng.choice(FIELDS) + grid[2:]
        mhz = rng.choice(band_keys) if i % 10 else rng.uniform(0.1, 1300.0)
        epoch = 1755043200 + 120 * (i // 7)
        spots.append(
            {
                "Spotnum": str(spotnum),
                "Date": str(epoch),
                "Reporter": f"N{i}XY" + ("/P" if i % 29 == 0 else ""),
                "ReporterGrid": rgrid,
                "dB": str(rng.randrange(-30, 21)),
                "MHz": f"{mhz:.6f}",
                "CallSign": f"K{i}AB",
                "Grid": grid,
                "Power": str(rng.choice([0, 10, 23, 30, 37, 60])),
                "Drift": str(rng.randrange(-4, 5)),
                "distance": str(rng.randrange(0, 20000)),
                "azimuth": str(rng.randrange(0, 360)),
                "Band": str(rng.choice([-1, 1, 3, 7, 10, 14])),
                "version": rng.choice(["2.6.1", "2.3.0", ""]),
                "code": str(rng.randrange(0, 3)),
                "unknown_extra_key": "should_be_dropped",
            }
        )

    inp = HERE / "spots_input.json"
    out = HERE / "spots_golden.csv"
    inp.write_text(json.dumps(spots, indent=1))
    with inp.open() as fin, out.open("w") as fout:
        subprocess.run(
            ["python3", REF, "-i", "-", "-o", "-"],
            stdin=fin,
            stdout=fout,
            check=True,
        )
    print(f"wrote {inp} ({n} spots) and {out}")


if __name__ == "__main__":
    main()
