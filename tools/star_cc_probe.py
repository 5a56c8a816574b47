"""Dense-graph probe: min-label pointer doubling vs large-star/small-star
connected components, at 1x and 10x edge counts.

The two engines have the same round bound (O(log n)) but different
per-round IO: min-label joins the FULL symmetrized edge multiset against
the label table every round, while star contraction rewrites the edge set
toward a star forest, so dense components collapse after round one and
later rounds move O(nodes) rows. This probe builds the adversarial shapes
for each engine and times both:

- `clique`: boilerplate regime — few huge near-duplicate families
  (dense components; edges >> nodes). Star's home turf.
- `chain`: long-path regime — diameter stress (edges ~ nodes). Pointer
  doubling's home turf; star must not regress badly here.

Usage: python tools/star_cc_probe.py [--scale 10]
Prints one markdown table row per (shape, engine, scale).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def clique_edges(n_components: int, size: int):
    out = []
    for c in range(n_components):
        base = c * size
        # clique via ring + chords (full K_m is O(m^2); ring+chords keeps
        # the component dense-ish at O(m * chords) while edge count stays
        # controllable — the LSH-verified graph is likewise not complete)
        for i in range(size):
            u = base + i
            out.append((u, base + (i + 1) % size))
            out.append((u, base + (i + 7) % size))
            out.append((u, base + (i + size // 2) % size))
    return out


def chain_edges(n_chains: int, length: int):
    out = []
    for c in range(n_chains):
        base = c * (length + 1)
        out.extend((base + i, base + i + 1) for i in range(length))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    args = ap.parse_args()

    from near_public_lakehouse_spark.queries.dedup import _min_label_cc, _star_cc
    from near_public_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="star_cc_probe")
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {
        "clique": lambda s: clique_edges(20 * s, 1000),
        "chain": lambda s: chain_edges(50 * s, 400),
    }
    engines = {"min_label": _min_label_cc, "star": _star_cc}

    print("| shape | engine | scale | edges | components | wall s |")
    print("|---|---|---|---|---|---|")
    for shape, gen in shapes.items():
        for s in (1, args.scale):
            pairs = gen(s)
            df = edges_df(spark, pairs).localCheckpoint()
            for ename, engine in engines.items():
                t0 = time.perf_counter()
                ncomp = (
                    engine(df).select("lab").distinct().count()
                )
                dt = time.perf_counter() - t0
                print(
                    f"| {shape} | {ename} | {s}x | {len(pairs)} "
                    f"| {ncomp} | {dt:.1f} |",
                    flush=True,
                )


if __name__ == "__main__":
    main()
