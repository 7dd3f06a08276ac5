"""Unit tests for corpus-analysis operators beyond the oracle gate
(pmi_bigrams; the rest are exercised via test_oracle)."""

import pyarrow as pa
import pyarrow.parquet as pq


class TestPMIBigrams:
    def _mk_corpus(self, tmp_path):
        # common filler words everywhere; "zx qv" is a rare pair that
        # ALWAYS co-occurs -> highest PMI despite low count
        docs = []
        for i in range(40):
            filler = "the cat sat on the mat " * 3
            if i % 10 == 0:
                filler += "zx qv "
            docs.append(filler.strip())
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_planted_collocation_ranks_first(
        self, tmp_path, ray_session, quiet_data_context
    ):
        from pdf_parser_ray.pipelines.analysis import pmi_bigrams

        sf = self._mk_corpus(tmp_path)
        df = pmi_bigrams(sf, k=5).to_pandas()
        assert df.iloc[0]["bigram"] == "zx qv"
        assert df.iloc[0]["n_xy"] == 4
        # PMI ordering is strictly decreasing down the list (ties broken
        # by bigram, but the planted pair is strictly strongest)
        assert df.iloc[0]["pmi_micros"] > df.iloc[1]["pmi_micros"]

    def test_min_count_threshold(self, tmp_path, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import PMI_MIN_COUNT, pmi_bigrams

        sf = self._mk_corpus(tmp_path)
        df = pmi_bigrams(sf, k=100).to_pandas()
        assert (df["n_xy"] >= PMI_MIN_COUNT).all()
        # once-only pairs never surface
        assert "qv the" not in set(df["bigram"])


class TestVocabCoverage:
    def test_monotone_and_complete(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import vocab_coverage

        df = vocab_coverage("/root/testdata/sf0.001")
        assert list(df["rank"]) == list(range(1, len(df) + 1))
        assert (df["n"].diff().dropna() <= 0).all()  # count-descending
        assert (df["coverage_micros"].diff().dropna() > 0).all()
        # the 31-word synthetic vocab fits inside V=50 -> full coverage
        assert df["coverage_micros"].iloc[-1] == 1_000_000

    def test_v_cap_binds(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import vocab_coverage

        df = vocab_coverage("/root/testdata/sf0.001", v=5)
        assert len(df) == 5
        assert df["coverage_micros"].iloc[-1] < 1_000_000


class TestCompressionRatio:
    def test_golden_against_zlib_and_signal_direction(
        self, ray_session, quiet_data_context
    ):
        import zlib

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import compression_ratio

        df = (
            compression_ratio("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("doc_id")
        )
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        for i, txt in list(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist()))[:25]:
            b = txt.encode()
            assert df.loc[i, "raw_len"] == len(b)
            assert df.loc[i, "comp_len"] == len(zlib.compress(b, 6))
            assert df.loc[i, "ratio_permille"] == len(zlib.compress(b, 6)) * 1000 // len(b)

    def test_repetitive_compresses_below_diverse(self, tmp_path, ray_session,
                                                 quiet_data_context):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import compression_ratio

        docs = ["spam " * 200, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s", "s"]),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        df = compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
        assert df.loc[0, "ratio_permille"] < df.loc[1, "ratio_permille"]


class TestTrainBPE:
    def _reference_merges(self, vocab, n_merges):
        """Independent straight-line BPE reference (kept deliberately
        different in structure from the pipeline's loop)."""
        seqs = {i: (tuple(w) + ("</w>",), n) for i, (w, n) in enumerate(vocab)}
        out = []
        for rank in range(1, n_merges + 1):
            from collections import Counter

            pc_ = Counter()
            for sym, n in seqs.values():
                for j in range(len(sym) - 1):
                    pc_[(sym[j], sym[j + 1])] += n
            if not pc_:
                break
            best_pair = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            (a, b), cnt = best_pair
            nxt = {}
            for i, (sym, n) in seqs.items():
                res, j = [], 0
                while j < len(sym):
                    if j < len(sym) - 1 and (sym[j], sym[j + 1]) == (a, b):
                        res.append(a + b)
                        j += 2
                    else:
                        res.append(sym[j])
                        j += 1
                nxt[i] = (tuple(res), n)
            seqs = nxt
            out.append((rank, a, b, cnt))
        return out

    def test_exact_equality_with_reference(self, ray_session, quiet_data_context):
        import duckdb

        from pdf_parser_ray.pipelines.analysis import (
            BPE_MERGES,
            BPE_VOCAB_CAP,
            train_bpe,
        )

        got = train_bpe("/root/testdata/sf0.01")
        con = duckdb.connect()
        vocab = con.sql(
            "SELECT word, CAST(count(*) AS BIGINT) AS n FROM ("
            " SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),"
            "   x -> x <> '')) AS word"
            " FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))"
            f" GROUP BY word ORDER BY n DESC, word LIMIT {BPE_VOCAB_CAP}"
        ).fetchall()
        want = self._reference_merges(vocab, BPE_MERGES)
        assert list(map(tuple, got.itertuples(index=False))) == want
        assert len(got) == BPE_MERGES

    def test_segment_counts_consistency(self, ray_session, quiet_data_context):
        """Subword token count >= word count (merges only ever shorten
        from the char level, never below one symbol per word) and the
        fully-merged common word segments shorter than its char count."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import bpe_segment_counts

        df = bpe_segment_counts("/root/testdata/sf0.001").to_pandas()
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        words = {
            i: txt.split()
            for i, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        }
        for _, row in df.head(30).iterrows():
            ws = words[row["doc_id"]]
            n_chars = sum(len(w) + 1 for w in ws)  # + </w>
            assert len(ws) <= row["n_bpe_tokens"] <= n_chars


class TestCCNetBuckets:
    def test_tiles_match_brute_force_ntile(self, ray_session, quiet_data_context):
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            ORACLE_VOCAB_CAP,
            ccnet_buckets,
            perplexity_scores,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            ccnet_buckets(sf, vocab_cap=ORACLE_VOCAB_CAP)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ppl = (
            perplexity_scores(sf, vocab_cap=ORACLE_VOCAB_CAP)
            .to_pandas()[["doc_id", "ppl_micros"]]
        )
        langs = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        df = ppl.merge(langs, on="doc_id")
        # brute-force ntile(3): rank by (ppl, doc_id) per lang, first
        # n%3 tiles take one extra row
        expect = {}
        for lang, grp in df.groupby("lang"):
            grp = grp.sort_values(["ppl_micros", "doc_id"])
            n = len(grp)
            base, rem = divmod(n, 3)
            sizes = [base + 1] * rem + [base] * (3 - rem)
            tile, used = 0, 0
            for doc_id in grp["doc_id"]:
                while used >= sizes[tile]:
                    tile, used = tile + 1, 0
                expect[doc_id] = tile
                used += 1
        assert (
            got["tile"] == got["doc_id"].map(expect)
        ).all()
        # every lang splits into exactly 3 tiles with |size diff| <= 1
        sizes = got.groupby(["lang", "tile"]).size().unstack()
        assert ((sizes.max(axis=1) - sizes.min(axis=1)) <= 1).all()


class TestDSIRResample:
    def test_topk_matches_brute_force_gumbel(self, ray_session, quiet_data_context):
        import numpy as np

        from pdf_parser_ray.pipelines.analysis import (
            ORACLE_VOCAB_CAP,
            dsir_resample,
            importance_weights,
        )
        from pdf_parser_ray.pipelines.pack import shuffle_key

        sf = "/root/testdata/sf0.001"
        got = dsir_resample(sf, k=25, vocab_cap=ORACLE_VOCAB_CAP).to_pandas()
        assert len(got) == 25
        # brute force: full scores over ALL docs, then top-25
        iw = importance_weights(sf, vocab_cap=ORACLE_VOCAB_CAP).to_pandas()
        ids = iw["doc_id"].to_numpy().astype(np.int64)
        u = (shuffle_key(ids) + 1) / 2147483648.0
        g = np.floor(-np.log(-np.log(u)) * 1e6).astype(np.int64)
        score = iw["weight_micros"].to_numpy() + g
        order = np.lexsort((ids, -score))[:25]
        assert set(got["doc_id"]) == set(ids[order])
        expect_score = dict(zip(ids.tolist(), score.tolist()))
        assert (
            got["score_micros"].to_numpy()
            == got["doc_id"].map(expect_score).to_numpy()
        ).all()
        merged = got.merge(
            iw[["doc_id", "weight_micros"]], on="doc_id", suffixes=("", "_iw")
        )
        assert (merged["weight_micros"] == merged["weight_micros_iw"]).all()


class TestOLSResiduals:
    def test_fit_matches_lstsq_and_residuals_center(self, ray_session, quiet_data_context):
        import numpy as np

        from pdf_parser_ray.pipelines.analysis import ols_residuals

        got = ols_residuals("/root/testdata/sf0.001").to_pandas()
        x = got["n_words"].to_numpy().astype(np.float64)
        y = got["n_unique"].to_numpy().astype(np.float64)
        # recover (a, b) from the residuals and compare to lstsq
        resid = got["resid_micros"].to_numpy() / 1e6
        fitted = y - resid
        b_np, a_np = np.polyfit(x, y, 1)
        assert np.allclose(fitted, a_np + b_np * x, atol=2e-6)
        # OLS residuals sum to ~zero (floor() biases each down < 1 micro)
        assert abs(resid.mean()) < 1e-5
        # the signal separates docs: both signs present
        assert (got["resid_micros"] > 0).any() and (got["resid_micros"] < 0).any()


class TestWordEntropy:
    def test_repetitive_scores_below_diverse(self, tmp_path, ray_session,
                                             quiet_data_context):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import word_entropy

        docs = ["spam " * 100, " ".join(f"w{i}" for i in range(100)), ""]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        df = word_entropy(str(tmp_path)).to_pandas().set_index("doc_id")
        # one repeated word -> ln(n/n) = 0 surprisal; 100 distinct words
        # -> exactly n * floor(ln(100) * 1e6)
        assert df.loc[0, "surprisal_micros"] == 0
        assert df.loc[1, "surprisal_micros"] == 100 * math.floor(
            math.log(100.0) * 1e6
        )
        assert df.loc[2, "surprisal_micros"] == 0 and df.loc[2, "n_words"] == 0


class TestRollupSourceLang:
    def test_margins_are_consistent(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import rollup_source_lang

        df = rollup_source_lang("/root/testdata/sf0.001").to_pandas()
        cells = df[df["gid"] == 0]
        by_source = df[df["gid"] == 1].set_index("source")
        by_lang = df[df["gid"] == 2].set_index("lang")
        total = df[df["gid"] == 3]
        assert len(total) == 1
        # every margin equals the sum of its cells, for both measures
        for col in ("n_docs", "total_chars"):
            assert (
                cells.groupby("source")[col].sum().sort_index()
                == by_source[col].sort_index()
            ).all()
            assert (
                cells.groupby("lang")[col].sum().sort_index()
                == by_lang[col].sort_index()
            ).all()
            assert cells[col].sum() == total[col].iloc[0]


class TestBM25:
    """Pin the all-integer Okapi form against the textbook float
    formula and its two defining behaviors (tf saturation and length
    normalization) that plain TF-IDF lacks."""

    @staticmethod
    def _int_term(idf_micros, tf, dl, avgdl_milli):
        r = dl * 1_000_000 // avgdl_milli
        return idf_micros * tf * 20000 // (8000 * tf + 3000 + 9 * r)

    def test_integer_form_tracks_float_bm25(self):
        import math

        n_docs, df, w_total = 1000, 37, 250_000
        avgdl = w_total / n_docs
        avgdl_milli = 1000 * w_total // n_docs
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        idf_micros = math.floor(idf * 1e6)
        k1, b = 1.5, 0.75
        for tf, dl in [(1, 50), (3, 250), (10, 250), (40, 900), (2, 1200)]:
            want = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
            got = self._int_term(idf_micros, tf, dl, avgdl_milli) / 1e6
            assert abs(got - want) < 1e-3 * max(want, 1.0)

    def test_tf_saturation(self):
        # doubling tf must raise the score by strictly less than 2x
        one = self._int_term(5_000_000, 5, 300, 300_000)
        two = self._int_term(5_000_000, 10, 300, 300_000)
        assert one < two < 2 * one

    def test_length_normalization(self):
        # same tf in a longer document scores strictly lower
        short = self._int_term(5_000_000, 5, 100, 300_000)
        long_ = self._int_term(5_000_000, 5, 900, 300_000)
        assert long_ < short

    def test_fit_stats_match_brute_force(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import BM25_QUERY, fit_bm25_stats

        sf = "/root/testdata/sf0.001"
        n_docs, n_words, dfs = fit_bm25_stats(sf)
        texts = pq.read_table(
            sf + "/documents.parquet", columns=["text"]
        ).column("text").to_pylist()
        assert n_docs == len(texts)
        assert n_words == sum(len(t.split()) for t in texts)
        for term, df in zip(BM25_QUERY, dfs):
            assert df == sum(1 for t in texts if term in t.split())
        assert all(df > 0 for df in dfs)  # query is live on the corpus


class TestPivotSourceLang:
    def test_fixed_schema_fails_loudly_on_unknown_lang(
        self, ray_session, quiet_data_context, monkeypatch
    ):
        # shrink the declared domain so the corpus's real languages
        # fall outside it: the widen kernel must raise, not widen or
        # silently drop
        import pytest

        import pdf_parser_ray.pipelines.analysis as an

        monkeypatch.setattr(an, "PIVOT_LANGS", ("de", "en"))
        with pytest.raises(Exception, match="PIVOT_LANGS"):
            an.pivot_source_lang("/root/testdata/sf0.001").to_pandas()

    def test_rows_sum_to_corpus(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import PIVOT_LANGS, pivot_source_lang

        sf = "/root/testdata/sf0.001"
        got = pivot_source_lang(sf).to_pandas()
        n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
        assert int(got["n_total"].sum()) == n_docs
        wide_sum = sum(int(got[f"n_{lang}"].sum()) for lang in PIVOT_LANGS)
        assert wide_sum == n_docs  # every doc lands in exactly one cell
        assert got["source"].is_unique


class TestSourceVocabOverlap:
    def test_all_pairs_and_bruteforce_spot(self, ray_session, quiet_data_context):
        from collections import Counter

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import source_vocab_overlap

        sf = "/root/testdata/sf0.001"
        got = source_vocab_overlap(sf).to_pandas()
        t = pq.read_table(sf + "/documents.parquet", columns=["source", "text"])
        sources = sorted(set(t.column("source").to_pylist()))
        n = len(sources)
        # every pair shares at least one word on this corpus
        assert len(got) == n * (n - 1) // 2
        assert (got["source_a"] < got["source_b"]).all()
        assert (got["ruzicka_micros"] > 0).all()
        assert (got["ruzicka_micros"] <= 1_000_000).all()
        # brute-force one pair with Counters
        a, b = sources[0], sources[1]
        ca: Counter = Counter()
        cb: Counter = Counter()
        for src, text in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            if src == a:
                ca.update(text.split())
            elif src == b:
                cb.update(text.split())
        smin = sum(min(ca[w], cb[w]) for w in ca.keys() & cb.keys())
        row = got[(got["source_a"] == a) & (got["source_b"] == b)].iloc[0]
        assert row["sum_min"] == smin
        assert row["n_a"] == sum(ca.values())
        assert row["n_b"] == sum(cb.values())
        assert row["ruzicka_micros"] == (1_000_000 * smin) // (
            row["n_a"] + row["n_b"] - smin
        )


class TestGramNovelty:
    def test_copy_has_zero_novelty(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """A verbatim copy of an earlier doc contributes zero novel
        grams; a <8-word doc reports (0, 0); a half-overlapping doc
        counts only its unseen grams."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import gram_novelty

        a = " ".join(f"w{i}" for i in range(12))  # 5 distinct 8-grams
        b = a  # full copy
        c = "tiny doc under eight words here"  # 6 words -> no grams
        d = " ".join(f"w{i}" for i in range(4, 20))  # overlaps a's tail
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array([a, b, c, d], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = (
            gram_novelty(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got.loc[1].tolist() == [5, 5]
        assert got.loc[2].tolist() == [5, 0]
        assert got.loc[3].tolist() == [0, 0]
        # d has 9 grams (w4..w19 = 16 words); w4..w11 is a's last gram
        assert got.loc[4, "n_grams"] == 9
        assert got.loc[4, "n_novel"] == 8


class TestTopWords:
    def test_exact_counts_and_cut(self, ray_session, quiet_data_context):
        from collections import Counter

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import TOP_WORDS_K, top_words

        sf = "/root/testdata/sf0.001"
        got = top_words(sf).to_pandas().reset_index(drop=True)
        c: Counter = Counter()
        for t in pq.read_table(
            sf + "/documents.parquet", columns=["text"]
        ).column("text").to_pylist():
            c.update(t.split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_WORDS_K]
        assert list(zip(got["word"], got["n"])) == want


class TestLengthPercentiles:
    def test_matches_pandas_rank(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import length_percentiles

        sf = "/root/testdata/sf0.001"
        got = (
            length_percentiles(sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        d = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ).to_pandas()
        d = d.sort_values(["source", "n_chars", "doc_id"]).reset_index(drop=True)
        d["rank0"] = d.groupby("source").cumcount()
        n = d.groupby("source")["doc_id"].transform("size")
        d["pct"] = (d["rank0"] * 1_000_000) // (n - 1).clip(lower=1)
        d.loc[n == 1, "pct"] = 0
        want = d.set_index("doc_id").sort_index()
        assert got["pct_micros"].tolist() == want["pct"].tolist()
        assert got["pct_micros"].min() == 0
        assert got["pct_micros"].max() == 1_000_000

    def test_singleton_source_and_ties(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import length_percentiles

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "source": pa.array(["a", "a", "a", "a", "b"], pa.string()),
                "n_chars": pa.array([10, 10, 10, 20, 7], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = (
            length_percentiles(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")["pct_micros"]
            .sort_index()
        )
        # ties rank by doc_id: ranks 0,1,2 of n=4 -> 0, 333333, 666666
        assert got.tolist() == [0, 333_333, 666_666, 1_000_000, 0]


class TestProfileDocuments:
    def test_nulls_and_distincts(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import profile_documents

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "lang": pa.array(["en", None, "en", "de"], pa.string()),
                "n_chars": pa.array([5, 5, None, 9], pa.int64()),
                "source": pa.array(["s1", "s1", "s1", "s1"], pa.string()),
                "text": pa.array(["x", "y", "y", None], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = (
            profile_documents(str(tmp_path))
            .to_pandas()
            .set_index("col")
            .sort_index()
        )
        assert got.loc["doc_id"].tolist() == [0, 4]
        assert got.loc["lang"].tolist() == [1, 2]
        assert got.loc["n_chars"].tolist() == [1, 2]
        assert got.loc["source"].tolist() == [0, 1]
        assert got.loc["text"].tolist() == [1, 2]


class TestRrfFusion:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        import math

        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            BM25_QUERY, RRF_K, RRF_OUT_K, RRF_TOPR, rrf_fusion,
        )

        sf = "/root/testdata/sf0.001"
        got = rrf_fusion(sf).to_pandas().reset_index(drop=True)
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        words = [t.split() for t in docs["text"]]
        n = len(docs)
        w_total = sum(len(w) for w in words)
        avgdl_milli = (1000 * w_total) // n
        tfs = {
            q: np.array([w.count(q) for w in words], dtype="int64")
            for q in BM25_QUERY
        }
        dfs = {q: int((tfs[q] > 0).sum()) for q in BM25_QUERY}
        dl = np.array([len(w) for w in words], dtype="int64")
        r = dl * 1_000_000 // avgdl_milli
        bm25 = np.zeros(n, "int64")
        plain = np.zeros(n, "int64")
        for q in BM25_QUERY:
            idf_b = math.floor(
                math.log(1 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5)) * 1e6
            )
            idf_p = math.floor(math.log(n / max(dfs[q], 1)) * 1e6)
            contrib = idf_b * tfs[q] * 20000 // (8000 * tfs[q] + 3000 + 9 * r)
            bm25 += np.where(tfs[q] > 0, contrib, 0)
            plain += idf_p * tfs[q]
        ids = docs["doc_id"].to_numpy("int64")

        def ranks(score):
            order = np.lexsort((ids, -score))[:RRF_TOPR]
            return {int(ids[i]): j + 1 for j, i in enumerate(order)}

        rb, rp = ranks(bm25), ranks(plain)
        fused = []
        for d in set(rb) | set(rp):
            rrf = sum(
                1_000_000 // (RRF_K + rk)
                for rk in (rb.get(d, 0), rp.get(d, 0))
                if rk > 0
            )
            fused.append((d, rb.get(d, 0), rp.get(d, 0), rrf))
        fused.sort(key=lambda t: (-t[3], t[0]))
        want = fused[:RRF_OUT_K]
        assert [tuple(x) for x in got.to_numpy()] == want
        # both retrievers must contribute to the fused head
        assert (got["bm25_rank"] > 0).any() and (got["tfidf_rank"] > 0).any()


class TestZipfFit:
    def test_matches_float_ols(self, ray_session, quiet_data_context):
        """Sign/positivity invariants of the corpus fit (the exact
        arithmetic is pinned by test_known_powerlaw and the oracle)."""
        from pdf_parser_ray.pipelines.analysis import zipf_fit

        got = zipf_fit("/root/testdata/sf0.001").to_pandas().iloc[0]
        nv = int(got["n_vocab"])
        assert nv > 2
        # reconstruct the float fit from the pipeline's own top-V output
        # is circular; instead assert the invariants: a frequency-sorted
        # head must fit with NEGATIVE slope, and the intercept must sit
        # near ln(max count) — i.e. above the slope-adjusted midpoint
        assert got["slope_micros"] < 0
        assert got["intercept_micros"] > 0

    def test_known_powerlaw(self):
        """Exact check on a synthetic power law: counts k ∝ 1/rank give
        slope ≈ −1 (within integer-log flooring error)."""
        import numpy as np

        from pdf_parser_ray.pipelines.analysis import _tdiv

        v = 24
        rank = np.arange(1, v + 1, dtype=np.float64)
        counts = np.floor(1_000_000 / rank)
        x = np.floor(np.log(rank) * 1e6).astype(np.int64)
        y = np.floor(np.log(counts) * 1e6).astype(np.int64)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x.astype(object) * y.astype(object)).sum())
        sxx = int((x.astype(object) * x.astype(object)).sum())
        num, den = v * sxy - sx * sy, v * sxx - sx * sx
        slope = _tdiv(num * 10**6, den)
        assert abs(slope + 1_000_000) < 1_000  # −1.000 ± 0.001

    def test_tdiv_truncates_like_duckdb(self):
        from pdf_parser_ray.pipelines.analysis import _tdiv

        assert _tdiv(-7, 2) == -3      # DuckDB //; Python -7//2 is -4
        assert _tdiv(7, 2) == 3
        assert _tdiv(-7, -2) == 3
        assert _tdiv(7, -2) == -3


class TestSourceKLDivergence:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """The floored-micros KL identity vs a Counter brute force;
        true KL (unfloored) must be non-negative per source."""
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import source_kl_divergence

        sf = "/root/testdata/sf0.001"
        got = (
            source_kl_divergence(sf)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        counts: Counter = Counter()
        for s, t in zip(docs["source"], docs["text"]):
            for w in t.split():
                counts[(s, w)] += 1
        n_s: Counter = Counter()
        c_w: Counter = Counter()
        for (s, w), k in counts.items():
            n_s[s] += k
            c_w[w] += k
        n_total = float(sum(n_s.values()))
        want_sum: dict = {}
        want_true: dict = {}
        for (s, w), k in counts.items():
            arg = (float(k) * n_total) / (float(n_s[s]) * float(c_w[w]))
            want_sum[s] = want_sum.get(s, 0) + k * int(
                math.floor(math.log(arg) * 1_000_000.0)
            )
            want_true[s] = want_true.get(s, 0.0) + k * math.log(arg)
        for _, row in got.iterrows():
            s = row["source"]
            assert int(row["n_tokens"]) == n_s[s]
            assert int(row["kl_sum_micros"]) == want_sum[s]
            # Gibbs: the exact (unfloored) KL is non-negative
            assert want_true[s] >= 0.0


class TestReadabilityScores:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Flesch-shaped integer fold vs a pure-Python re recomputation;
        the components must be non-degenerate on the corpus."""
        import re

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import readability_scores

        sf = "/root/testdata/sf0.001"
        got = (
            readability_scores(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        vowel = re.compile(r"[aeiou]+")
        sent = re.compile(r"[.!?]")
        docs = docs.sort_values("doc_id").reset_index(drop=True)
        for _, row in docs.sample(60, random_state=7).iterrows():
            g = got[got["doc_id"] == row["doc_id"]].iloc[0]
            nw = len(row["text"].split())
            ns = len(sent.findall(row["text"]))
            sy = len(vowel.findall(row["text"].lower()))
            assert g["n_words"] == nw
            assert g["n_sents"] == ns
            assert g["n_syll"] == sy
            want = (
                206_835_000
                - (1_015_000 * nw) // max(ns, 1)
                - (84_600_000 * sy) // max(nw, 1)
            )
            assert g["flesch_micros"] == want
        # the signal must vary across the corpus — not a constant
        assert got["flesch_micros"].nunique() > 10
        assert (got["n_syll"] > 0).any()
        # pinned corpus fact: the synthetic documents carry NO sentence
        # punctuation, so every doc scores as a single clamped sentence
        assert (got["n_sents"] == 0).all()

    def test_sentence_term_binds(self, ray_session, quiet_data_context, tmp_path):
        """On text WITH sentence marks the words/sentences term must
        move the score (the sf corpus never exercises it)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import readability_scores

        texts = [
            "Short words win. Easy to read. Yes!",
            "polysyllabic obfuscation perpetually exacerbates comprehension "
            "difficulties notwithstanding elaborate circumlocution",
            "One sentence? Two! Three. And a trailing fragment",
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = (
            readability_scores(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["n_sents"].tolist() == [3, 0, 3]
        # simple punchy sentences score far above the polysyllabic run-on
        assert got.loc[0, "flesch_micros"] > got.loc[1, "flesch_micros"]


class TestDocTopTerms:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Per-doc argmax tf·idf vs an independent pure-Python idf fit
        (top-V cap + OOV default recomputed from scratch)."""
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            ORACLE_VOCAB_CAP, doc_top_terms,
        )

        sf = "/root/testdata/sf0.001"
        cap = ORACLE_VOCAB_CAP
        got = (
            doc_top_terms(sf, vocab_cap=cap)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        dfc: Counter = Counter()
        for t in docs["text"]:
            dfc.update(set(t.split()))
        top = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        n = len(docs)
        idf = {w: math.floor(math.log(n / d) * 1e6) for w, d in top}
        oov = math.floor(math.log(n / 1.0) * 1e6)
        assert len(idf) == cap  # the cap binds on the corpus vocab
        want_rows = {}
        for _, row in docs.iterrows():
            words = row["text"].split()
            if not words:
                continue
            scored = [
                (-(idf.get(w, oov) * k), w, k)
                for w, k in Counter(words).items()
            ]
            s, w, k = min(scored)
            want_rows[row["doc_id"]] = (w, k, -s)
        assert len(got) == len(want_rows)
        for _, g in got.iterrows():
            w, k, s = want_rows[g["doc_id"]]
            assert g["top_word"] == w and g["tf"] == k and g["score_micros"] == s
        # OOV must actually be exercised somewhere (cap < vocab size)
        assert len(dfc) > cap


class TestWinnowFingerprints:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Winnowing digest vs a pure-Python per-window enumeration
        (min hash, rightmost tie, dedup) on a corpus sample; the
        corpus must be ASCII for the SQL ord() mirror."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            WIN_BASE, WIN_K, WIN_MOD, WIN_POS, WIN_W, winnow_fingerprints,
        )

        sf = "/root/testdata/sf0.001"
        got = winnow_fingerprints(sf).to_pandas()
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        assert docs["text"].map(lambda t: t.isascii()).all()
        powers = [pow(WIN_BASE, WIN_K - 1 - j, WIN_MOD) for j in range(WIN_K)]
        by_doc = {d: set() for d in docs["doc_id"]}
        for _, r in got.iterrows():
            by_doc[r["doc_id"]].add((int(r["pos"]), int(r["fp"])))
        for _, row in docs.sample(25, random_state=3).iterrows():
            data = row["text"].encode()
            m = len(data) - WIN_K + 1
            want = set()
            if m >= WIN_W:
                hs = [
                    sum(data[i + j] * powers[j] for j in range(WIN_K)) % WIN_MOD
                    for i in range(m)
                ]
                for w0 in range(m - WIN_W + 1):
                    # min hash, rightmost position on ties
                    best = min(
                        (hs[i] * WIN_POS + (WIN_POS - 1 - (i + 1)))
                        for i in range(w0, w0 + WIN_W)
                    )
                    want.add(
                        (WIN_POS - 1 - (best % WIN_POS), best // WIN_POS)
                    )
            assert by_doc[row["doc_id"]] == want

    def test_moss_guarantee(self, ray_session, quiet_data_context, tmp_path):
        """The winnowing guarantee: two documents sharing a substring
        of length >= w + k - 1 share at least one fingerprint VALUE."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            WIN_K, WIN_W, winnow_fingerprints,
        )

        shared = "the quick brown fox jumps over the lazy dog again and again"
        assert len(shared) >= WIN_W + WIN_K - 1
        texts = [
            "prefix alpha " + shared + " suffix one",
            "totally different opening here " + shared + " closing words",
            "no overlap with anything interesting in this record at all",
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = winnow_fingerprints(str(tmp_path)).to_pandas()
        fps = {
            d: set(got.loc[got["doc_id"] == d, "fp"]) for d in range(3)
        }
        assert fps[0] & fps[1]  # shared substring -> shared fingerprint
        # and the digests are not degenerate-identical
        assert fps[0] != fps[1]


class TestHeapsLawCurve:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Curve vs a Python first-occurrence walk; pinned corpus fact:
        the 31-word synthetic vocabulary saturates at the first
        checkpoint (flat distinct curve, growing token curve)."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            HEAPS_CHECKPOINTS, heaps_law_curve,
        )

        sf = "/root/testdata/sf0.001"
        got = heaps_law_curve(sf).sort_values("checkpoint").reset_index(drop=True)
        docs = (
            pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        n = len(docs)
        firsts: dict = {}
        toks = np.zeros(n, np.int64)
        for r, row in docs.iterrows():
            ws = row["text"].split()
            toks[r] = len(ws)
            for w in ws:
                firsts.setdefault(w, row["doc_id"])
        cum_toks = toks.cumsum()
        for _, g in got.iterrows():
            c = int(g["checkpoint"])
            rank = min(n, ((c + 1) * n) // HEAPS_CHECKPOINTS) - 1
            b = int(docs.loc[rank, "doc_id"])
            assert g["last_doc_id"] == b
            assert g["n_tokens_cum"] == cum_toks[rank]
            assert g["n_distinct_cum"] == sum(
                1 for f in firsts.values() if f <= b
            )
        assert got["n_tokens_cum"].is_monotonic_increasing
        # pinned: tiny closed vocab saturates immediately
        assert got["n_distinct_cum"].nunique() == 1

    def test_growth_on_open_vocabulary(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """On an open-vocabulary corpus the distinct curve must grow
        sublinearly in tokens (the Heaps shape)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import heaps_law_curve

        texts = []
        k = 0
        for i in range(64):
            ws = []
            for j in range(40):
                # zipf-ish: repeat early words, mint new ones slowly
                ws.append(f"w{(k % max(4, k // 3)) if (j % 3) else k}")
                k += 1
            texts.append(" ".join(ws))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(64), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = heaps_law_curve(str(tmp_path)).sort_values("checkpoint")
        d = got["n_distinct_cum"].to_numpy()
        t = got["n_tokens_cum"].to_numpy()
        assert d[-1] > d[0] > 0  # vocabulary actually grows
        # sublinear: vocab growth rate falls below token growth rate
        assert d[-1] / d[0] < t[-1] / t[0]

    def test_tiny_corpus_matches_oracle(
        self, ray_session, quiet_data_context, tmp_path
    ):
        """Corpora smaller than the checkpoint grid: early checkpoints
        must clamp to the FIRST doc on BOTH engines (the Python side
        used to resolve index -1 = the largest doc while the SQL
        yielded NULL boundaries)."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entrymod
        from pdf_parser_ray.pipelines.analysis import heaps_law_curve

        p = str(tmp_path / "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([3, 7, 11, 20], pa.int64()),
                    "text": pa.array(
                        ["a b c", "a d", "e f g h", "a e i"], pa.string()
                    ),
                }
            ),
            p,
        )
        got = (
            heaps_law_curve(str(tmp_path))
            .sort_values("checkpoint")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
        )
        want = (
            con.execute(entrymod._heaps_sql())
            .fetchdf()
            .sort_values("checkpoint")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # early checkpoints clamp to the first doc, not the last
        assert int(got["last_doc_id"].iloc[0]) == 3


class TestLengthRankTest:
    def test_matches_scipy_free_brute_force(self, ray_session, quiet_data_context):
        """Doubled-midrank U vs a direct all-pairs count (wins + half
        ties) — the definition, no rank algebra."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            RANK_TEST_SRC_A, RANK_TEST_SRC_B, length_rank_test,
        )

        sf = "/root/testdata/sf0.001"
        got = length_rank_test(sf).iloc[0]
        d = pq.read_table(
            sf + "/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        la = [
            len(t.split())
            for t in d.loc[d["source"] == RANK_TEST_SRC_A, "text"]
        ]
        lb = [
            len(t.split())
            for t in d.loc[d["source"] == RANK_TEST_SRC_B, "text"]
        ]
        u_x2 = sum(
            2 * (x > y) + (x == y) for x in la for y in lb
        )  # pairwise definition, doubled
        assert got["n_a"] == len(la) and got["n_b"] == len(lb)
        assert got["u_x2_a"] == u_x2
        assert got["auc_micros"] == (u_x2 * 1_000_000) // (
            2 * len(la) * len(lb)
        )
        # same-generator sources: no real shift
        assert 300_000 < got["auc_micros"] < 700_000

    def test_planted_shift_saturates(self, ray_session, quiet_data_context, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import length_rank_test

        texts = ["w " * 50] * 20 + ["w " * 5] * 20  # a longer, b shorter
        srcs = ["src0"] * 20 + ["src1"] * 20
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array([t.strip() for t in texts], pa.string()),
                    "lang": pa.array(["en"] * 40),
                    "source": pa.array(srcs, pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = length_rank_test(str(tmp_path)).iloc[0]
        assert got["auc_micros"] == 1_000_000  # total separation


class TestLangSourceChi2:
    def test_matches_brute_force_and_calibration(
        self, ray_session, quiet_data_context
    ):
        """Integer chi-squared vs a Python recomputation; on the
        independent synthetic mixture the statistic sits near its df
        (the chi-squared mean under H0)."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import lang_source_chi2

        sf = "/root/testdata/sf0.001"
        got = lang_source_chi2(sf).iloc[0]
        d = pq.read_table(
            sf + "/documents.parquet", columns=["source", "lang"]
        ).to_pandas()
        m = d.groupby(["source", "lang"]).size()
        rows = d.groupby("source").size()
        cols = d.groupby("lang").size()
        N = len(d)
        K = 1000
        tot = 0
        for s in rows.index:
            for l in cols.index:
                o = int(m.get((s, l), 0))
                dd = o * N - int(rows[s]) * int(cols[l])
                tot += (dd * dd * K) // (int(rows[s]) * int(cols[l]))
        assert got["n"] == N
        assert got["df"] == (len(rows) - 1) * (len(cols) - 1)
        assert got["chi2_milli"] == tot // N
        # under independence, E[chi2] = df: allow a generous band
        assert got["chi2_milli"] < 3000 * got["df"]

    def test_planted_dependence(self, ray_session, quiet_data_context, tmp_path):
        """A perfectly language-segregated pair of sources maxes the
        statistic (chi2 = N for a 2x2 with full association)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import lang_source_chi2

        n = 200
        src = ["feedA"] * (n // 2) + ["feedB"] * (n // 2)
        lang = ["en"] * (n // 2) + ["de"] * (n // 2)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(["x"] * n),
                    "lang": pa.array(lang, pa.string()),
                    "source": pa.array(src, pa.string()),
                    "n_chars": pa.array([1] * n, pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = lang_source_chi2(str(tmp_path)).iloc[0]
        assert got["df"] == 1
        assert got["chi2_milli"] == 1000 * n  # chi2 == N at full association


class TestLengthKsTest:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Integer KS distance vs a direct CDF sweep; U and D must
        agree on 'no significant shift' for the same-generator pair."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            RANK_TEST_SRC_A, RANK_TEST_SRC_B, length_ks_test,
        )

        sf = "/root/testdata/sf0.001"
        got = length_ks_test(sf).iloc[0]
        d = pq.read_table(
            sf + "/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        la = sorted(
            len(t.split())
            for t in d.loc[d["source"] == RANK_TEST_SRC_A, "text"]
        )
        lb = sorted(
            len(t.split())
            for t in d.loc[d["source"] == RANK_TEST_SRC_B, "text"]
        )
        na, nb = len(la), len(lb)
        best, at = -1, -1
        for v in sorted(set(la) | set(lb)):
            ca = sum(1 for x in la if x <= v)
            cb = sum(1 for x in lb if x <= v)
            gap = abs(ca * nb - cb * na)
            if gap > best:
                best, at = gap, v
        assert got["n_a"] == na and got["n_b"] == nb
        assert got["d_micros"] == (best * 1_000_000) // (na * nb)
        assert got["at_length"] == at
        # same generator: D below the alpha=.05 critical ~1.36*sqrt(2/n)
        assert got["d_micros"] < 1_360_000 * np.sqrt(2 / na)

    def test_planted_shape_change(self, ray_session, quiet_data_context, tmp_path):
        """A pure shape change (same median, split tails) that the
        rank test misses but KS catches: AUC ≈ 500000, D large."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            length_ks_test, length_rank_test,
        )

        # src0: all docs exactly 20 words; src1: half 5, half 35 words
        texts = (["w " * 20] * 40) + (["w " * 5] * 20 + ["w " * 35] * 20)
        srcs = ["src0"] * 40 + ["src1"] * 40
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(80), pa.int64()),
                    "text": pa.array([t.strip() for t in texts], pa.string()),
                    "lang": pa.array(["en"] * 80),
                    "source": pa.array(srcs, pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        u = length_rank_test(str(tmp_path)).iloc[0]
        ks = length_ks_test(str(tmp_path)).iloc[0]
        assert u["auc_micros"] == 500_000      # rank test: blind
        assert ks["d_micros"] == 500_000       # KS: half the mass displaced
        assert ks["at_length"] == 5


class TestLengthVocabSpearman:
    def test_matches_midrank_corrcoef(self, ray_session, quiet_data_context):
        """Integer-moment Spearman vs numpy corrcoef over explicit
        midranks (±1 micro float-path tolerance); the corpus
        correlation must be strongly positive."""
        import numpy as np
        import pyarrow.parquet as pq
        from pdf_parser_ray.pipelines.analysis import length_vocab_spearman

        sf = "/root/testdata/sf0.001"
        got = length_vocab_spearman(sf).iloc[0]
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["text"]
        ).to_pandas()
        w = np.array([len(t.split()) for t in docs["text"]], np.float64)
        d = np.array([len(set(t.split())) for t in docs["text"]], np.float64)

        def midrank(v):
            order = np.argsort(v, kind="stable")
            r = np.empty(len(v), np.float64)
            sv = v[order]
            i = 0
            while i < len(sv):
                j = i
                while j < len(sv) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return r

        rho = float(np.corrcoef(midrank(w), midrank(d))[0, 1])
        assert got["n"] == len(docs)
        assert abs(got["rho_micros"] - np.floor(rho * 1e6)) <= 1
        assert got["rho_micros"] > 700_000  # genuinely monotone corpus

    def test_perfect_monotone_extremes(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import length_vocab_spearman

        # tie-free increasing lengths with vocab == length -> rho = 1
        texts = [" ".join(f"u{i}w{j}" for j in range(5 + i)) for i in range(20)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(20), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * 20),
                    "source": pa.array(["s"] * 20),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = length_vocab_spearman(str(tmp_path)).iloc[0]
        assert got["rho_micros"] == 1_000_000


class TestHillTailIndex:
    def test_matches_brute_force(self, ray_session, quiet_data_context):
        """Hill estimate vs a Counter recomputation with the same
        per-term ln-micros floors; the light-tailed closed synthetic
        vocab reads a LARGE alpha (near-uniform counts), diverging
        from zipf_fit's whole-curve slope — the kinked-regime flag
        the pair exists to expose."""
        import math
        from collections import Counter

        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import HILL_K, hill_tail_index

        sf = "/root/testdata/sf0.001"
        got = hill_tail_index(sf).iloc[0]
        docs = pq.read_table(
            sf + "/documents.parquet", columns=["text"]
        ).to_pandas()
        c: Counter = Counter()
        for t in docs["text"]:
            c.update(t.split())
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: HILL_K + 1]
        x_ref = top[HILL_K][1]
        s = sum(
            math.floor(math.log(n / x_ref) * 1_000_000) for _, n in top[:HILL_K]
        )
        assert got["k"] == HILL_K and got["x_ref"] == x_ref
        assert got["alpha_micros"] == (HILL_K * 10**12) // s
        assert got["alpha_micros"] > 5_000_000  # light tail, alpha >> 1

    def test_planted_pareto_tail(self, ray_session, quiet_data_context, tmp_path):
        """A word-frequency table built from an exact power law
        recovers alpha near the planted exponent."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import hill_tail_index

        # counts n_r = floor(10000 / r^2): alpha = 2... Hill over counts
        # x ~ r^-2 means survival exponent 1/2?  Hill on the ORDERED
        # counts with x_i/x_ref = (ref_rank/i)^2 -> alpha ≈ k / sum
        # 2 ln(21/i) — just assert the recovered value against the
        # closed form rather than the asymptotic exponent
        import math

        texts = []
        for r in range(1, 200):
            n = max(1, 10000 // (r * r))
            texts.extend([f"word{r:03d}"] * n)
        # pack into docs of 100 tokens
        docs = [
            " ".join(texts[i : i + 100]) for i in range(0, len(texts), 100)
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "lang": pa.array(["en"] * len(docs)),
                    "source": pa.array(["s"] * len(docs)),
                    "n_chars": pa.array([len(d) for d in docs], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = hill_tail_index(str(tmp_path)).iloc[0]
        k, x_ref = int(got["k"]), int(got["x_ref"])
        expect_s = sum(
            math.floor(
                math.log(max(1, 10000 // (i * i)) / x_ref) * 1_000_000
            )
            for i in range(1, k + 1)
        )
        assert got["alpha_micros"] == (k * 10**12) // expect_s
        # for a rank^-2 count law the Hill alpha over top-20 sits ~0.5
        assert 300_000 < got["alpha_micros"] < 800_000


class TestPrefixDupGroups:
    def test_planted_templates(self, ray_session, quiet_data_context, tmp_path):
        """Docs sharing the first-16-word template group together; a
        17th-word difference is invisible, a 16th-word difference
        splits."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import prefix_dup_groups

        tpl = " ".join(f"w{i}" for i in range(16))
        docs = {
            1: tpl + " tail one",
            5: tpl + " completely different continuation here",
            9: tpl,  # exactly the prefix
            2: " ".join(f"w{i}" for i in range(15)) + " OTHER tail",
            3: "unrelated text entirely",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values())),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = prefix_dup_groups(str(tmp_path)).to_pandas()
        assert len(df) == 1
        assert int(df["n_docs"].iloc[0]) == 3
        assert int(df["min_doc_id"].iloc[0]) == 1

    def test_hash_matches_scalar_reference(self):
        """The in-pipeline hash is the simhash char polynomial of the
        joined prefix."""
        from pdf_parser_ray.pipelines.dedup import (
            _SIMHASH_HASH_BASE, _SIMHASH_HASH_MOD,
        )

        text = "alpha beta gamma"
        h = 0
        for ch in " ".join(text.split()[:16]):
            h = (h * _SIMHASH_HASH_BASE + ord(ch)) % _SIMHASH_HASH_MOD
        assert h > 0  # the family leaves no zero for nonempty prefixes


class TestWordLengthHistogram:
    def test_brute_force_counts(self, ray_session, quiet_data_context, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import (
            WORD_LEN_CAP, word_length_histogram,
        )

        texts = ["a bb ccc a", "dddd " + "x" * 100]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = (
            word_length_histogram(str(tmp_path))
            .to_pandas()
            .set_index("length")
        )
        assert int(df.loc[1, "n_words"]) == 2
        assert int(df.loc[2, "n_words"]) == 1
        assert int(df.loc[3, "n_words"]) == 1
        assert int(df.loc[4, "n_words"]) == 1
        # the 100-char monster clamps to the cap bucket
        assert int(df.loc[WORD_LEN_CAP, "n_words"]) == 1
        assert int(df["n_words"].sum()) == 6
        assert int(df.loc[1, "share_micros"]) == 2 * 1_000_000 // 6


class TestTemporalVocabDrift:
    def test_identical_halves_zero_and_drift_positive(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import temporal_vocab_drift

        def write(docs, d):
            d.mkdir(exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(list(docs), pa.int64()),
                        "text": pa.array(list(docs.values())),
                    }
                ),
                str(d / "documents.parquet"),
            )
            return str(d)

        # same distribution on both sides of the id-range midpoint -> 0
        sf = write({0: "a a b", 10: "a a b"}, tmp_path / "same")
        df = temporal_vocab_drift(sf).to_pandas().set_index("half")
        assert int(df.loc[0, "kl_micros"]) == 0
        assert int(df.loc[1, "kl_micros"]) == 0
        assert int(df.loc[0, "n_tokens"]) == 3

        # shared support with shifted mass -> strictly positive KL
        sf2 = write({0: "a a a b", 10: "a b b b"}, tmp_path / "drift")
        d2 = temporal_vocab_drift(sf2).to_pandas().set_index("half")
        assert int(d2.loc[0, "kl_micros"]) > 0
        assert int(d2.loc[1, "kl_micros"]) > 0

    def test_one_sided_words_excluded_from_shared(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import temporal_vocab_drift

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 10], pa.int64()),
                    "text": pa.array(["a a onlyearly", "a a onlylate x"]),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = temporal_vocab_drift(str(tmp_path)).to_pandas().set_index("half")
        assert int(df.loc[0, "n_tokens"]) == 3
        assert int(df.loc[0, "n_shared_tokens"]) == 2  # just the a's
        assert int(df.loc[1, "n_shared_tokens"]) == 2


class TestMaxRepeatedNgram:
    def test_planted_repetitions(self, ray_session, quiet_data_context, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import max_repeated_ngram

        docs = {
            1: "x y z x y z",          # repeated 3-gram, twice
            2: "a b c d e f",          # all distinct -> (0, 0)
            3: "p p p p",              # run: 3-gram repeated twice
            4: "q r q s q t",          # only the unigram q repeats (x3)
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values())),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = {
            int(r.doc_id): (int(r.max_n), int(r.n_occ))
            for r in max_repeated_ngram(str(tmp_path))
            .to_pandas()
            .itertuples()
        }
        assert got == {1: (3, 2), 2: (0, 0), 3: (3, 2), 4: (1, 3)}


class TestLengthDecilesByLang:
    def test_brute_force(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import length_deciles_by_lang

        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["lang", "n_chars"],
        ).to_pandas()
        got = length_deciles_by_lang("/root/testdata/sf0.001").to_pandas()
        for lang, sub in t.groupby("lang"):
            v = sorted(sub["n_chars"])
            n = len(v)
            for d in range(1, 10):
                want = v[(d * n + 9) // 10 - 1]
                row = got[(got["lang"] == lang) & (got["decile"] == d)]
                assert int(row["cutoff_chars"].iloc[0]) == want, (lang, d)


class TestStorageAudit:
    def test_footer_truth(self, ray_session, quiet_data_context):
        """Per-table counts equal a direct pyarrow footer read; no
        table data is required to exist in memory."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import storage_audit

        df = (
            storage_audit("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("table_name")
        )
        md = pq.ParquetFile(
            "/root/testdata/sf0.001/documents.parquet"
        ).metadata
        assert int(df.loc["documents", "n_rows"]) == md.num_rows
        assert int(df.loc["documents", "n_row_groups"]) == md.num_row_groups
        assert int(df.loc["documents", "n_files"]) == 1
        assert (df["compressed_bytes"] > 0).all()


class TestSentenceStats:
    def test_planted_sentences(self, ray_session, quiet_data_context, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import sentence_stats

        docs = {
            1: "One two. Three!  Four five six?",  # 3 sentences
            2: "no terminal punctuation at all",   # 1 fragment
            3: "...!!!",                            # empties only -> 0
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values())),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = (
            sentence_stats(str(tmp_path)).to_pandas().set_index("doc_id")
        )
        assert int(df.loc[1, "n_sentences"]) == 3
        lens = [len("One two"), len("Three"), len("Four five six")]
        assert int(df.loc[1, "mean_sent_chars_milli"]) == 1000 * sum(lens) // 3
        assert int(df.loc[1, "max_sent_chars"]) == max(lens)
        assert int(df.loc[2, "n_sentences"]) == 1
        assert int(df.loc[3, "n_sentences"]) == 0


class TestBigramEntropy:
    def test_deterministic_text_zero_and_mixed_positive(
        self, ray_session, quiet_data_context, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import bigram_entropy

        def run(docs, d):
            d.mkdir(exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(range(len(docs)), pa.int64()),
                        "text": pa.array(docs),
                    }
                ),
                str(d / "documents.parquet"),
            )
            return bigram_entropy(str(d)).to_pandas().iloc[0]

        # fully deterministic successor: every w1 has ONE w2 -> H = 0
        r = run(["a b a b a b"], tmp_path / "det")
        assert int(r["h_micros"]) == 0
        assert int(r["n_bigrams"]) == 5
        # 'a' followed by b or c equally -> H = ln 2 per 'a'-bigram
        r2 = run(["a b a c a b a c"], tmp_path / "mix")
        # bigrams: ab,ba,ac,ca,ab,ba,ac  -> k1(a)=4 (ab x2, ac x2),
        # k1(b)=2? b->a twice; c->a once... positive entropy
        assert int(r2["h_micros"]) > 0

    def test_brute_force_small(self, ray_session, quiet_data_context, tmp_path):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import bigram_entropy

        docs = ["x y z x y", "y z y z"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(docs),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        from collections import Counter

        big = Counter()
        for t in docs:
            ws = t.split()
            for a, b in zip(ws[:-1], ws[1:]):
                big[(a, b)] += 1
        left = Counter()
        for (a, _), k in big.items():
            left[a] += k
        A = sum(
            k * math.floor(math.log(left[a] / k) * 1_000_000)
            for (a, _), k in big.items()
        )
        N = sum(big.values())
        r = bigram_entropy(str(tmp_path)).to_pandas().iloc[0]
        assert int(r["n_bigrams"]) == N
        assert int(r["n_distinct_bigrams"]) == len(big)
        assert int(r["h_micros"]) == A // N


class TestLangTokenDensity:
    def test_brute_force(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.analysis import lang_token_density

        df = (
            lang_token_density("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("lang")
        )
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["lang", "text"],
        ).to_pandas()
        for lang, sub in t.groupby("lang"):
            tk = int(sub["text"].str.split().str.len().sum())
            ch = int(sub["text"].str.len().sum())
            row = df.loc[lang]
            assert int(row["n_docs"]) == len(sub)
            assert int(row["n_tokens"]) == tk
            assert int(row["n_chars"]) == ch
            assert int(row["tokens_per_kchar_milli"]) == 1_000_000 * tk // ch
