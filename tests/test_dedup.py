

class TestSoftDedupWeights:
    def test_group_mass_and_consistency(self, ray_session, quiet_data_context):
        """Weights are floor(1e6/n); each group's total weight is within
        one group-size of 1e6; group sizes agree with normalized_dedup."""
        from pdf_parser_ray.pipelines.dedup import (
            normalized_dedup, soft_dedup_weights,
        )

        sf = "/root/testdata/sf0.001"
        w = soft_dedup_weights(sf).to_pandas()
        nd = normalized_dedup(sf).to_pandas()
        assert len(w) == int(nd["n_members"].sum())
        assert (w["weight_micros"] == 1_000_000 // w["n_members"]).all()
        got_sizes = sorted(w["n_members"].value_counts().items())
        # normalized_dedup reports one row per group; expand to per-doc
        want = sorted(
            (int(n), int((nd["n_members"] == n).sum() * n))
            for n in nd["n_members"].unique()
        )
        assert got_sizes == [(n, c) for n, c in want]


class TestDupGroupSizes:
    def test_mass_conservation(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import dup_group_sizes

        sf = "/root/testdata/sf0.001"
        got = dup_group_sizes(sf).to_pandas()
        n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
        assert int((got["n_members"] * got["n_groups"]).sum()) == n_docs

    def test_synthetic_groups(self, ray_session, quiet_data_context, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import dup_group_sizes

        texts = ["alpha beta", "Alpha, beta!", "ALPHA   beta", "gamma",
                 "delta", "Delta?"]
        t = pa.table({"text": pa.array(texts, pa.string())})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = dup_group_sizes(str(tmp_path)).to_pandas()
        # groups: {alpha beta}x3, {gamma}x1, {delta}x2
        assert dict(zip(got["n_members"], got["n_groups"])) == {
            3: 1, 1: 1, 2: 1,
        }


class TestCrossSourceOverlap:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        import hashlib
        import itertools

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import (
            CLONE_MOD, CLONE_SHIFT, CLONE_SOURCES, cross_source_overlap,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            cross_source_overlap(sf)
            .to_pandas()
            .set_index(["source_a", "source_b"])["n_shared"]
            .to_dict()
        )
        d = pq.read_table(sf + "/documents.parquet").to_pandas()

        def norm(t):
            import re

            t = re.sub(r"[^a-z0-9 ]+", "", t.lower())
            return re.sub(r" +", " ", t).strip(" ")

        pairs = set()
        seen = {}
        for _, r in d.iterrows():
            h = hashlib.md5(norm(r["text"]).encode()).hexdigest()
            seen.setdefault(h, set()).add(r["source"])
            if r["doc_id"] % CLONE_MOD == 0:
                seen[h].add(f"src{(r['doc_id'] + CLONE_SHIFT) % CLONE_SOURCES}")
        want = {}
        for srcs in seen.values():
            for a, b in itertools.combinations(sorted(srcs), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want


class TestFuzzyNamePairs:
    def test_matches_brute_force_on_corpus(self, ray_session, quiet_data_context):
        """Deletion-neighborhood join equals brute-force levenshtein=1
        over distinct corpus names (the candidate-completeness guard
        that keeps the SQL oracle valid)."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import fuzzy_name_pairs

        sf = "/root/testdata/sf0.001"
        got = {
            (r["name_a"], r["name_b"])
            for _, r in fuzzy_name_pairs(sf).to_pandas().iterrows()
        }
        names = sorted(
            set(
                pq.read_table(sf + "/part.parquet", columns=["p_name"])
                .column("p_name")
                .to_pylist()
            )
        )

        def lev1(a: str, b: str) -> bool:
            if a == b or abs(len(a) - len(b)) > 1:
                return False
            if len(a) == len(b):
                return sum(x != y for x, y in zip(a, b)) == 1
            s, l = (a, b) if len(a) < len(b) else (b, a)
            return any(l[:i] + l[i + 1 :] == s for i in range(len(l)))

        want = {
            (a, b)
            for i, a in enumerate(names)
            for b in names[i + 1 :]
            if lev1(a, b)
        }
        assert got == want
        assert len(want) > 0  # the indel family binds on the corpus

    def test_substitution_family(self, ray_session, quiet_data_context, tmp_path):
        """Planted equal-length names differing at one char — the
        substitution key family — plus distance-2 decoys that must NOT
        pair."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import fuzzy_name_pairs

        names = [
            "brass bolt",
            "brass belt",  # substitution vs "brass bolt" (one char)
            "grass melt",  # distance >= 2 from everything else
            "brass bol",   # deletion of "brass bolt" (indel family)
        ] * 3  # duplicates exercise the distinct stage
        pq.write_table(
            pa.table({"p_name": pa.array(names, pa.string())}),
            str(tmp_path / "part.parquet"),
        )
        got = {
            (r["name_a"], r["name_b"])
            for _, r in fuzzy_name_pairs(str(tmp_path)).to_pandas().iterrows()
        }
        want = {
            ("brass belt", "brass bolt"),  # substitution key family
            ("brass bol", "brass bolt"),   # indel key family
        }
        assert got == want  # decoy out, "brass belt"/"brass bol" (d=2) out


class TestNearDupRateBySource:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Per-source dup rates vs a pandas md5 brute force over the
        same clone-augmented corpus; mirror reads 100%, real feeds the
        re-delivery rate, counts conserve."""
        import hashlib

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.dedup import (
            MIRROR_CLONE_OFFSET, REDELIVERY_CLONE_OFFSET,
            near_dup_rate_by_source,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            near_dup_rate_by_source(sf)
            .to_pandas()
            .set_index("source")
            .sort_index()
        )
        d = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "text", "source"]
        ).to_pandas()
        rows = []
        for _, r in d.iterrows():
            h = hashlib.md5(r["text"].encode()).hexdigest()
            rows.append((r["doc_id"], h, r["source"]))
            if r["doc_id"] % 7 == 0:
                rows.append((r["doc_id"] + MIRROR_CLONE_OFFSET, h, "mirror"))
            if r["doc_id"] % 11 == 0:
                rows.append(
                    (r["doc_id"] + REDELIVERY_CLONE_OFFSET, h, r["source"])
                )
        c = pd.DataFrame(rows, columns=["doc_id", "th", "source"])
        c["survivor"] = c.groupby("th")["doc_id"].transform("min")
        c["dup"] = c["doc_id"] != c["survivor"]
        want = c.groupby("source").agg(
            n_docs=("dup", "size"), n_dups=("dup", "sum")
        )
        for s, r in want.iterrows():
            assert got.loc[s, "n_docs"] == r["n_docs"]
            assert got.loc[s, "n_dups"] == r["n_dups"]
            assert got.loc[s, "dup_micros"] == (
                r["n_dups"] * 1_000_000
            ) // r["n_docs"]
        assert got.loc["mirror", "dup_micros"] == 1_000_000
        real = got.drop("mirror")
        assert (real["n_dups"] > 0).any()  # re-delivery family binds
        assert got["n_docs"].sum() == len(c)


class TestDedupThresholdCurve:
    def test_monotone_and_consistent_with_pairs(
        self, ray_session, quiet_data_context
    ):
        from pdf_parser_ray.pipelines.dedup import (
            DEDUP_CURVE_THRESHOLDS, dedup_threshold_curve, minhash_dedup,
        )

        sf = "/root/testdata/sf0.001"
        curve = (
            dedup_threshold_curve(sf)
            .to_pandas()
            .set_index("threshold_millis")["n_pairs"]
        )
        pairs = minhash_dedup(sf, threshold_millis=500).to_pandas()
        real = pairs[pairs["doc_id_a"] >= 0]
        for t in DEDUP_CURVE_THRESHOLDS:
            assert int(curve[t]) == int((real["jaccard_millis"] >= t).sum())
        # non-increasing in the threshold, and the lowest bin sees all
        assert list(curve) == sorted(curve, reverse=True)
        assert int(curve[500]) == len(real)
