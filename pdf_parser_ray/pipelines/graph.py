"""Graph analytics over a corpus-derived link graph: PageRank on the
host graph — the classic web-curation authority signal (Page et al.
1999; CommonCrawl publishes exactly this as its host-level ranking).

Scale shape (the part that must survive 100 TB): the corpus is first
REDUCED to a bounded weighted adjacency — each document contributes a
constant number of (src, dst) host edges, per-batch ``np.bincount``
partials over the (V·V)-bounded key domain tree-reduce through a
64-bucket ``groupby.map_groups`` pandas combine (the cluster.py
pattern; never a global Ray aggregate) — and only then does the power
iteration run, over that bounded artifact.  The iteration state is
V ranks, independent of corpus size, exactly like the k centroids in
``cluster.kmeans``: the 100 TB pass is the edge aggregation; the graph
itself is the model artifact.  For an UNBOUNDED node domain (per-URL
graphs) the same iteration becomes a dst-keyed co-shuffle join per
pass — documented here as the generalization, not needed for the
host-level (V=101) graph this operator targets.

Determinism (what makes the DuckDB oracle possible): edges come from an
integer formula of doc_id, damping is the exact rational 17/20, ranks
are integers at 1e12 scale, and every per-edge contribution is floored
BEFORE the sum — so the oracle unrolls the same iterations as K chained
CTEs with the same `//` arithmetic.  Driver math uses Python ints
(arbitrary precision); the SQL casts products through HUGEINT — both
sides overflow-proof at any corpus size.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .io_util import arrow_udf, read_parquet_clean

#: host-node domain: host(doc) = doc_id % 101 (the same shared-host
#: rule the pages corpus uses for doc_id co-location).
PR_NODES = 101
#: out-links per document: dst_k = (doc_id // 101 + k·src + k²) % 101
#: for k in 1..3 — varies WITHIN a host via the doc_id // 101 term.
PR_FANOUT = 3
PR_ITERS = 5
PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 17, 20  # damping d = 0.85 as an exact rational
_REDUCE_BUCKETS = 64


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    from .dedup import _blocks_for

    path = os.path.join(sf_dir, "documents.parquet")
    return read_parquet_clean(
        path, columns=columns, override_num_blocks=_blocks_for(path)
    )


def _edge_partials(batch: pa.Table) -> pa.Table:
    """Per-batch weighted-edge partial: one bincount over the bounded
    (V·V) key domain, nonzero (key, w) rows out — constant-size output
    regardless of batch size."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    src = ids % PR_NODES
    counts = np.zeros(PR_NODES * PR_NODES, dtype=np.int64)
    for k in range(1, PR_FANOUT + 1):
        dst = (ids // PR_NODES + k * src + k * k) % PR_NODES
        counts += np.bincount(
            src * PR_NODES + dst, minlength=PR_NODES * PR_NODES
        )
    key = np.flatnonzero(counts)
    return pa.table(
        {
            "b": pa.array((key % _REDUCE_BUCKETS).astype(np.int64)),
            "key": pa.array(key),
            "w": pa.array(counts[key]),
        }
    )


def _combine_edges(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby("key", as_index=False, sort=True)["w"].sum()
    return out.astype(np.int64)


def host_graph_edges(sf_dir: str) -> rd.Dataset:
    """(src, dst, w) weighted host adjacency — the distributed
    reduction; ≤ V² narrow rows out of one streaming pass."""

    def split_key(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(key // PR_NODES),
                "dst": pa.array(key % PR_NODES),
                "w": batch.column("w"),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_edge_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(arrow_udf(_combine_edges), batch_format="pandas")
        .map_batches(split_key, batch_format="pyarrow", zero_copy_batch=True)
    )


def pagerank_hosts(sf_dir: str) -> pd.DataFrame:
    """(node, out_w, rank_scaled): PR_ITERS damped power-iteration
    passes over the host graph, ranks as integers at PR_SCALE.

    rank₀(v) = PR_SCALE // V;  each pass:
      rank(v) = (3·PR_SCALE) // (20·V)
              + Σ_{u→v} (17 · rank(u) · w(u,v)) // (20 · out(u))
    (per-edge floor, then sum — the order the oracle mirrors).
    Dangling nodes (no out-edges) simply leak their damped mass, the
    standard simplification; every node still receives the teleport
    term, so the output always has exactly V rows."""
    edges = host_graph_edges(sf_dir).to_pandas()  # ≤ V² rows — bounded
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    w = edges["w"].to_numpy()

    out_w = np.zeros(PR_NODES, dtype=np.int64)
    np.add.at(out_w, src, w)

    # Python-int driver math: products reach rank·w ≈ 1e12·corpus_size,
    # past int64 at web scale, so stay in arbitrary precision.
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * PR_NODES)
    rank = [PR_SCALE // PR_NODES] * PR_NODES
    for _ in range(PR_ITERS):
        nxt = [base] * PR_NODES
        for s, d, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
            nxt[d] += (PR_DAMP_NUM * rank[s] * wt) // (
                PR_DAMP_DEN * int(out_w[s])
            )
        rank = nxt

    return pd.DataFrame(
        {
            "node": np.arange(PR_NODES, dtype=np.int64),
            "out_w": out_w,
            "rank_scaled": np.array(rank, dtype=np.int64),
        }
    )


def doc_host_rank(sf_dir: str) -> rd.Dataset:
    """(doc_id, node, rank_scaled): every document annotated with its
    host's PageRank — the authority-signal join a curation pipeline
    runs to prioritize high-rank hosts.

    Scale shape: the canonical SMALL-SIDE BROADCAST join — the rank
    table is V rows (a model artifact, like the kmeans centroids), so
    it ships to workers once via ``ray.put`` and the join is a
    stateless vectorized ``np.take`` inside ``map_batches``; the
    document side streams, nothing shuffles.  This is the pattern that
    replaces a corpus-wide hash join whenever one side is bounded."""
    import ray

    ranks = pagerank_hosts(sf_dir)
    lut = np.zeros(PR_NODES, dtype=np.int64)
    lut[ranks["node"].to_numpy()] = ranks["rank_scaled"].to_numpy()
    ref = ray.put(lut)

    def annotate(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        node = (ids % PR_NODES).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "node": pa.array(node),
                "rank_scaled": pa.array(table[node]),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(
        annotate, batch_format="pyarrow", zero_copy_batch=True
    )


def host_triangles(sf_dir: str) -> pd.DataFrame:
    """(n_nodes, n_edges, n_wedges, n_triangles, transitivity_micros):
    triangle census of the UNDIRECTED simple host graph (self-loops
    dropped, weights and direction ignored) — the local-density signal
    of web link curation (spam farms show near-clique transitivity;
    organic host neighborhoods sit far lower).

    Scale shape: identical to :func:`pagerank_hosts` — the 100 TB work
    is the streaming edge reduction (``host_graph_edges``: per-batch
    bincount partials over the bounded V² domain), after which the
    graph is a ≤ V²-row model artifact and the census is driver math
    (exact int64 ``trace(A³)/6`` on the V×V adjacency).  For an
    UNBOUNDED node domain the same census is the classic oriented
    wedge join — orient edges low→high, each node emits its (v, w)
    neighbor pairs, wedges co-shuffle against the edge set keyed by
    the (v, w) endpoint pair, and each triangle closes exactly once
    at its smallest vertex — the generalization documented here, not
    needed at V = 101.

    transitivity = 3·triangles / wedges, floored to integer micros
    (both counts are non-negative, so truncating division is a true
    floor on both sides of the oracle)."""
    edges = host_graph_edges(sf_dir).to_pandas()  # ≤ V² rows — bounded
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])

    adj = np.zeros((PR_NODES, PR_NODES), dtype=np.int64)
    adj[a, b] = 1
    adj[b, a] = 1

    deg = adj.sum(axis=1)
    n_nodes = int((deg > 0).sum())
    n_edges = int(adj.sum()) // 2
    n_wedges = int((deg * (deg - 1) // 2).sum())
    n_triangles = int(np.trace(adj @ adj @ adj)) // 6
    trans = 0 if n_wedges == 0 else (3 * n_triangles * 1_000_000) // n_wedges

    return pd.DataFrame(
        {
            "n_nodes": np.array([n_nodes], np.int64),
            "n_edges": np.array([n_edges], np.int64),
            "n_wedges": np.array([n_wedges], np.int64),
            "n_triangles": np.array([n_triangles], np.int64),
            "transitivity_micros": np.array([trans], np.int64),
        }
    )


def host_degree_stats(sf_dir: str) -> pd.DataFrame:
    """(degree, n_hosts): degree histogram of the UNDIRECTED simple
    host graph (self-loops dropped, weights/direction ignored) — the
    first-look structural signal of a link graph (power-law tails mark
    organic webs; near-regular degree marks synthetic or mirrored
    link farms).  Isolated hosts report degree 0.

    Scale shape: the :func:`host_graph_edges` streaming reduction does
    the 100 TB work; the histogram is driver math over the bounded
    ≤ V²-row artifact (the pagerank_hosts pattern)."""
    edges = host_graph_edges(sf_dir).to_pandas()  # ≤ V² rows — bounded
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    adj = np.zeros((PR_NODES, PR_NODES), dtype=np.int64)
    adj[a, b] = 1
    adj[b, a] = 1
    deg = adj.sum(axis=1)
    hist = np.bincount(deg, minlength=1)
    nz = np.flatnonzero(hist)
    return pd.DataFrame(
        {
            "degree": nz.astype(np.int64),
            "n_hosts": hist[nz].astype(np.int64),
        }
    )


def host_clustering(sf_dir: str) -> pd.DataFrame:
    """(node, degree, n_tri, cc_micros): LOCAL clustering coefficient
    per host — 2·triangles(v) / (deg·(deg−1)) in floored integer
    micros (0 when deg < 2) — the per-node companion to
    :func:`host_triangles`' global transitivity: spam-farm hosts show
    near-1e6 local density while organic hubs sit low even at equal
    degree.

    Scale shape: same bounded-artifact pattern — triangles(v) is
    diag(A³)/2 on the V×V adjacency, exact int64 driver math after the
    streaming edge reduction; the oracle closes each triangle with an
    ordered wedge join (n1.y < n2.y) so every triangle at v counts
    once on both engines."""
    edges = host_graph_edges(sf_dir).to_pandas()  # ≤ V² rows — bounded
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    adj = np.zeros((PR_NODES, PR_NODES), dtype=np.int64)
    adj[a, b] = 1
    adj[b, a] = 1
    deg = adj.sum(axis=1)
    tri = np.diag(adj @ adj @ adj) // 2
    denom = deg * (deg - 1)
    cc = np.where(denom >= 2, (2 * tri * 1_000_000) // np.maximum(denom, 1), 0)
    return pd.DataFrame(
        {
            "node": np.arange(PR_NODES, dtype=np.int64),
            "degree": deg.astype(np.int64),
            "n_tri": tri.astype(np.int64),
            "cc_micros": cc.astype(np.int64),
        }
    )


def host_assortativity(sf_dir: str) -> pd.DataFrame:
    """(n_edges, r_micros): degree assortativity of the undirected
    simple host graph — the Pearson correlation of endpoint degrees
    over edges (Newman 2002), each undirected edge contributing both
    orientations.  r > 0: hubs link hubs (tiered link farms);
    r < 0: hubs link leaves (organic hub-and-spoke webs).  Completes
    the structural panel next to :func:`host_degree_stats`,
    :func:`host_clustering` and :func:`host_triangles`.

    Float discipline: the five moment sums over oriented edge endpoint
    degrees are exact integers; one shared IEEE expression
    cov / (sqrt(vx)·sqrt(vy)) floored to micros (the
    relational.user_value_autocorr fold).  Driver math over the
    bounded edge artifact, like every host-graph metric here."""
    import math

    edges = host_graph_edges(sf_dir).to_pandas()  # ≤ V² rows — bounded
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    adj = np.zeros((PR_NODES, PR_NODES), dtype=np.int64)
    adj[a, b] = 1
    adj[b, a] = 1
    deg = adj.sum(axis=1)
    ai, bi = np.nonzero(np.triu(adj, 1))
    x = np.concatenate([deg[ai], deg[bi]])  # both orientations
    y = np.concatenate([deg[bi], deg[ai]])
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    cov = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (
        0.0
        if vx <= 0 or vy <= 0
        else float(cov) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    )
    return pd.DataFrame(
        {
            "n_edges": np.array([n // 2], np.int64),
            "r_micros": np.array([math.floor(r * 1_000_000)], np.int64),
        }
    )


def host_components(sf_dir: str) -> pd.DataFrame:
    """(host, component_id, component_size): weakly connected
    components of the host co-citation graph — component_id is the
    smallest host id reachable (the canonical label), the partition a
    crawl scheduler shards isolated site clusters by.

    Scale shape: the edge list is the bounded V² artifact of
    :func:`host_graph_edges` (the distributed reduction does the 100 TB
    work); union-find over it is driver math.  The SQL mirror computes
    the same labels via transitive closure."""
    edges = host_graph_edges(sf_dir).to_pandas()
    parent = list(range(PR_NODES + 1))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes: set[int] = set()
    for s, d in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        nodes.add(s)
        nodes.add(d)
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            if rs < rd_:
                parent[rd_] = rs
            else:
                parent[rs] = rd_
    rows = sorted((n, find(n)) for n in nodes)
    sizes: dict[int, int] = {}
    for _, c in rows:
        sizes[c] = sizes.get(c, 0) + 1
    return pd.DataFrame(
        {
            "host": np.array([n for n, _ in rows], np.int64),
            "component_id": np.array([c for _, c in rows], np.int64),
            "component_size": np.array(
                [sizes[c] for _, c in rows], np.int64
            ),
        }
    )
