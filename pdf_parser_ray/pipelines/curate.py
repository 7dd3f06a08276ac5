"""End-to-end training-corpus curation — the composition a 100 TB text
pipeline actually runs:

    exact dedup  →  near-dup clustering (MinHash pairs → connected
    components)  →  quality gate  →  language tag  →  curated corpus

Connected components use driver-side union-find over the *verified pair
set only* — legitimate because the pair set is provably small (bounded
by MAX_PAIRS_PER_GROUP per LSH bucket, and orders of magnitude smaller
than the corpus); the corpus itself never leaves the cluster.  The
resulting drop-set is broadcast back into a vectorized filter.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from .analysis import _LANG_PROFILES, _TOKEN_RE
from .dedup import exact_dedup, minhash_dedup, with_near_dups, _docs


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def near_dup_clusters(sf_dir: str, threshold_millis: int = 500) -> rd.Dataset:
    """(doc_id, cluster_id, cluster_size): connected components over the
    verified MinHash near-duplicate pairs; cluster_id = min doc_id in the
    component (deterministic)."""
    pairs = minhash_dedup(sf_dir, threshold_millis=threshold_millis).to_pandas()
    uf = _UnionFind()
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        uf.union(int(a), int(b))
    members: dict[int, list[int]] = {}
    for node in list(uf.parent):
        members.setdefault(uf.find(node), []).append(node)

    ids, cluster_ids, sizes = [], [], []
    for root, nodes in sorted(members.items()):
        for n in sorted(nodes):
            ids.append(n)
            cluster_ids.append(root)
            sizes.append(len(nodes))
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster_ids, pa.int64()),
                "cluster_size": pa.array(sizes, pa.int64()),
            }
        )
    )


def curate_documents(
    sf_dir: str, *, min_tokens: int = 10, threshold_millis: int = 500
) -> rd.Dataset:
    """(doc_id, lang_pred, n_tokens, drop_reason): one row per document
    of the (near-dup-augmented) corpus with its curation verdict —
    ``drop_reason`` in {'', 'exact_dup', 'near_dup', 'too_short'}; empty
    means kept.  Returning verdicts rather than a filtered table keeps
    the output auditable (the filtered corpus is one ``filter`` away).
    """
    # exact-dup survivors (hash groupby, distributed)
    keepers = set(
        exact_dedup(sf_dir).to_pandas()["doc_id"].astype(int).tolist()
    )
    # near-dup components: every member except the cluster root drops
    clusters = near_dup_clusters(sf_dir, threshold_millis).to_pandas()
    near_dup_drops = set(
        int(d)
        for d, c in zip(clusters["doc_id"], clusters["cluster_id"])
        if int(d) != int(c)
    )
    verdict_ref = ray.put((keepers, near_dup_drops))

    def verdicts(batch: pa.Table) -> pa.Table:
        keep_set, drop_set = ray.get(verdict_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs, n_tokens, reasons = [], [], []
        for doc_id, text in zip(ids, texts):
            toks = _TOKEN_RE.findall(text)
            words = [t.lower() for t in toks]
            scores = {
                lang: sum(w in prof for w in words)
                for lang, prof in _LANG_PROFILES.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "und")
            n_tokens.append(len(toks))
            if doc_id in drop_set:
                reasons.append("near_dup")
            elif doc_id not in keep_set and doc_id < 10_000_000:
                reasons.append("exact_dup")
            elif len(toks) < min_tokens:
                reasons.append("too_short")
            else:
                reasons.append("")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang_pred": pa.array(langs, pa.string()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "drop_reason": pa.array(reasons, pa.string()),
            }
        )

    corpus = with_near_dups(_docs(sf_dir, ["doc_id", "text"]))
    return corpus.map_batches(verdicts, batch_format="pyarrow", zero_copy_batch=True)
