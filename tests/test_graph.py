"""Structural invariants of the host-graph PageRank (the SQL-mirror
equivalence is covered by test_oracle.py; these pin the mass-accounting
and edge-synthesis semantics the oracle can't isolate)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.pipelines.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_FANOUT,
    PR_ITERS,
    PR_NODES,
    PR_SCALE,
    host_graph_edges,
    pagerank_hosts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ranks(ray_session, quiet_data_context):
    return pagerank_hosts(SF_DIR)


class TestHostGraphEdges:
    def test_matches_brute_force_formula(self, ray_session, quiet_data_context):
        ids = np.asarray(
            pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_pylist(),
            dtype=np.int64,
        )
        want = {}
        for i in ids:
            s = int(i) % PR_NODES
            for k in range(1, PR_FANOUT + 1):
                d = (int(i) // PR_NODES + k * s + k * k) % PR_NODES
                want[(s, d)] = want.get((s, d), 0) + 1
        got = host_graph_edges(SF_DIR).to_pandas()
        assert {
            (int(r.src), int(r.dst)): int(r.w) for r in got.itertuples()
        } == want

    def test_total_weight_is_fanout_times_docs(self, ray_session, quiet_data_context):
        n_docs = pq.read_metadata(SF_DIR + "/documents.parquet").num_rows
        got = host_graph_edges(SF_DIR).to_pandas()
        assert int(got["w"].sum()) == PR_FANOUT * n_docs


class TestPageRank:
    def test_every_node_ranked(self, ranks):
        assert len(ranks) == PR_NODES
        assert sorted(ranks["node"]) == list(range(PR_NODES))

    def test_mass_accounting(self, ranks):
        # every node keeps at least the teleport base; total mass never
        # exceeds the initial PR_SCALE (per-edge floors + dangling
        # leakage only ever REMOVE mass)
        base = (
            (PR_DAMP_DEN - PR_DAMP_NUM)
            * PR_SCALE
            // (PR_DAMP_DEN * PR_NODES)
        )
        assert (ranks["rank_scaled"] >= base).all()
        assert int(ranks["rank_scaled"].sum()) <= PR_SCALE

    def test_deterministic(self, ranks, ray_session, quiet_data_context):
        again = pagerank_hosts(SF_DIR)
        assert (
            ranks.sort_values("node")["rank_scaled"].to_numpy()
            == again.sort_values("node")["rank_scaled"].to_numpy()
        ).all()

    def test_iterations_move_mass(self, ranks):
        # after PR_ITERS damped passes the distribution must no longer
        # be uniform (the synthetic graph is deliberately skewed)
        assert ranks["rank_scaled"].nunique() > 1


class TestDocHostRank:
    def test_rank_matches_host_pagerank(self, ranks, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.graph import doc_host_rank

        got = doc_host_rank(SF_DIR).to_pandas()
        lut = ranks.set_index("node")["rank_scaled"].to_dict()
        assert (got["node"] == got["doc_id"] % PR_NODES).all()
        assert (
            got["rank_scaled"].to_numpy()
            == got["node"].map(lut).to_numpy()
        ).all()
        n_docs = pq.read_metadata(SF_DIR + "/documents.parquet").num_rows
        assert len(got) == n_docs


class TestHostTriangles:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Exact triangle/wedge counts vs an itertools brute force over
        the undirected simple host graph; the trace identity must agree
        with direct enumeration and transitivity must be in [0, 1]."""
        from itertools import combinations

        from pdf_parser_ray.pipelines.graph import host_triangles

        sf = "/root/testdata/sf0.001"
        got = host_triangles(sf)
        assert len(got) == 1
        row = got.iloc[0]

        from pdf_parser_ray.pipelines.graph import host_graph_edges

        edges = host_graph_edges(sf).to_pandas()
        und = set()
        for s, d in zip(edges["src"], edges["dst"]):
            if s != d:
                und.add((min(int(s), int(d)), max(int(s), int(d))))
        nodes = {n for e in und for n in e}
        adj = {n: set() for n in nodes}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)
        tri = sum(
            1
            for a, b in und
            for c in adj[a] & adj[b]
            if c > b  # each triangle once: a < b < c
        )
        wedges = sum(
            len(list(combinations(sorted(adj[n]), 2))) for n in nodes
        )
        assert int(row["n_nodes"]) == len(nodes)
        assert int(row["n_edges"]) == len(und)
        assert int(row["n_wedges"]) == wedges
        assert int(row["n_triangles"]) == tri
        assert tri > 0  # census must be non-vacuous on the fixture graph
        assert 0 <= int(row["transitivity_micros"]) <= 1_000_000


class TestHostDegreeStats:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Degree histogram vs a set-based brute force; counts must
        conserve the node domain and the spread must be non-trivial."""
        from collections import Counter

        from pdf_parser_ray.pipelines.graph import (
            PR_NODES, host_degree_stats, host_graph_edges,
        )

        sf = "/root/testdata/sf0.001"
        got = host_degree_stats(sf).sort_values("degree").reset_index(drop=True)
        edges = host_graph_edges(sf).to_pandas()
        adj = {n: set() for n in range(PR_NODES)}
        for s, d in zip(edges["src"], edges["dst"]):
            if s != d:
                adj[int(s)].add(int(d))
                adj[int(d)].add(int(s))
        hist = Counter(len(v) for v in adj.values())
        assert got["n_hosts"].sum() == PR_NODES  # every host counted once
        assert len(got) > 3  # real degree spread, not a regular graph
        for _, r in got.iterrows():
            assert hist[int(r["degree"])] == int(r["n_hosts"])


class TestHostClustering:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Per-node local clustering vs neighbor-set intersection; the
        trace-based triangle count and the floor-micros fold must both
        agree, and the coefficient must vary across hosts."""
        from pdf_parser_ray.pipelines.graph import (
            PR_NODES, host_clustering, host_graph_edges,
        )

        sf = "/root/testdata/sf0.001"
        got = host_clustering(sf).sort_values("node").reset_index(drop=True)
        assert len(got) == PR_NODES
        edges = host_graph_edges(sf).to_pandas()
        adj = {n: set() for n in range(PR_NODES)}
        for s, d in zip(edges["src"], edges["dst"]):
            if s != d:
                adj[int(s)].add(int(d))
                adj[int(d)].add(int(s))
        for _, r in got.iterrows():
            v = int(r["node"])
            nb = adj[v]
            deg = len(nb)
            tri = sum(len(adj[u] & nb) for u in nb) // 2
            assert int(r["degree"]) == deg
            assert int(r["n_tri"]) == tri
            want = (
                (2 * tri * 1_000_000) // (deg * (deg - 1)) if deg >= 2 else 0
            )
            assert int(r["cc_micros"]) == want
        assert got["cc_micros"].nunique() > 3  # coefficient varies


class TestHostComponents:
    def test_labels_are_reachability_consistent(
        self, ray_session, quiet_data_context
    ):
        """Union-find labels agree with a brute-force BFS over the
        same edge artifact; sizes partition the node set."""
        from collections import deque

        from pdf_parser_ray.pipelines.graph import (
            host_components, host_graph_edges,
        )

        sf = "/root/testdata/sf0.001"
        edges = host_graph_edges(sf).to_pandas()
        adj: dict[int, set[int]] = {}
        for s, d in zip(edges["src"].astype(int), edges["dst"].astype(int)):
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        want: dict[int, int] = {}
        for start in sorted(adj):
            if start in want:
                continue
            seen = {start}
            q = deque([start])
            while q:
                x = q.popleft()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        q.append(y)
            label = min(seen)
            for n in seen:
                want[n] = label
        got = host_components(sf)
        assert {
            int(r.host): int(r.component_id) for r in got.itertuples()
        } == want
        sizes = got.groupby("component_id")["host"].nunique()
        assert int(sizes.sum()) == len(want)
        assert (
            got.groupby("component_id")["component_size"].first() == sizes
        ).all()
