"""Unit tests for the curation-filter and analysis scalar kernels
(quality verdict rules, PII scrubbing, rolling fingerprint).  The
pipeline-vs-DuckDB equivalence is covered by test_oracle.py; these pin
the per-rule semantics the oracle can't isolate."""

import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.pipelines.analysis import (
    _FP_BASE,
    _FP_MOD,
    _FP_WINDOW,
    rolling_fingerprint,
    word_counter_stats,
)
from pdf_parser_ray.pipelines.filter import (
    quality_verdict,
    scrub,
    synth_contact,
)


class TestQualityVerdict:
    def test_too_short(self):
        assert quality_verdict(*word_counter_stats("a b c")) == "too_short"
        assert quality_verdict(0, 0, 0, 0) == "too_short"

    def test_too_long(self):
        assert quality_verdict(200_000, 100_000, 2, 1_000_000) == "too_long"

    def test_short_words(self):
        # 30 single-char words: mean word length 1 < 2
        text = " ".join(str(i % 10) for i in range(30))
        assert quality_verdict(*word_counter_stats(text)) == "short_words"

    def test_long_words(self):
        text = " ".join(f"verylongword{i}xxxxxxxxx" for i in range(30))
        assert quality_verdict(*word_counter_stats(text)) == "long_words"

    def test_repetitive(self):
        # 'the' is 10/40 = 25% > 12%
        text = " ".join(["the"] * 10 + [f"word{i}" for i in range(30)])
        assert quality_verdict(*word_counter_stats(text)) == "repetitive"

    def test_low_diversity(self):
        # 12 distinct over 40 words = 30% < 35%; max word count 4/40 =
        # 10% stays under the 12% repetition cap so this rule isolates
        text = " ".join(f"word{i % 12}" for i in range(40))
        assert quality_verdict(*word_counter_stats(text)) == "low_diversity"

    def test_ok(self):
        text = " ".join(f"word{i}" for i in range(40))
        assert quality_verdict(*word_counter_stats(text)) == "ok"

    def test_rule_order_short_beats_repetitive(self):
        # 5 identical words: both too_short and repetitive apply;
        # ordered rules report the first
        assert quality_verdict(*word_counter_stats("x x x x x")) == "too_short"


class TestScrub:
    def test_counts_and_redaction(self):
        n_em, n_ph, n_ssn, red = scrub(
            "mail a.b@site.example call 555-1234 ssn 123-45-6789 end"
        )
        assert (n_em, n_ph, n_ssn) == (1, 1, 1)
        assert red == "mail [EMAIL] call [PHONE] ssn [SSN] end"

    def test_ssn_not_counted_as_phone(self):
        # the dashed-digit tail of an SSN must not also match the
        # phone pattern (word boundaries prevent it)
        n_em, n_ph, n_ssn, red = scrub("123-45-6789")
        assert (n_em, n_ph, n_ssn) == (0, 0, 1)
        assert red == "[SSN]"

    def test_synth_contact_deterministic(self):
        s = synth_contact(30, "some document text here")
        # 30 % 2 == 0 -> email, % 3 == 0 -> phone, % 5 == 0 -> ssn
        assert "EMAIL user30@mail2.example" in s
        assert "CALL 230-1030" in s
        assert "SSN 130-40-1030" in s
        assert s.endswith("some document text here")
        n_em, n_ph, n_ssn, _ = scrub(s)
        assert (n_em, n_ph, n_ssn) == (1, 1, 1)

    def test_no_pii_passthrough(self):
        assert scrub("plain words only") == (0, 0, 0, "plain words only")


class TestRollingFingerprint:
    def test_short_text_is_zero(self):
        assert rolling_fingerprint("1234567") == 0
        assert rolling_fingerprint("") == 0

    def test_matches_direct_window_hash(self):
        # the rolling recurrence must equal the plain polynomial hash
        # of each 8-byte window (this is what the SQL oracle computes)
        text = "the quick brown fox jumps over the lazy dog"
        data = text.encode()

        def window_hash(i):
            h = 0
            for k in range(_FP_WINDOW):
                h = (h * _FP_BASE + data[i + k]) % _FP_MOD
            return h

        expected = min(
            window_hash(i) for i in range(len(data) - _FP_WINDOW + 1)
        )
        assert rolling_fingerprint(text) == expected

    def test_window_locality(self):
        # a pure window hash ignores the prefix: a shared 8-gram yields
        # a shared candidate hash, so min over a repeated text is stable
        assert rolling_fingerprint("abcdefgh") == rolling_fingerprint(
            "zzzzzzzzabcdefgh"
        ) or rolling_fingerprint("zzzzzzzzabcdefgh") < rolling_fingerprint(
            "abcdefgh"
        )

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_oracle_corpora_are_ascii(self, sf):
        # the SQL fingerprint oracle works char-wise (ord == byte value
        # only for ASCII); pin the assumption on the oracle corpora
        t = pq.read_table(
            f"/root/testdata/{sf}/documents.parquet", columns=["text"]
        )
        assert all(s.isascii() for s in t.column("text").to_pylist())


class TestVocabCap:
    """The train-small/score-wide fits must broadcast a BOUNDED model:
    top-V words + an OOV default (VERDICT r02 'What's wrong' #2).  At
    100 TB the uncapped open-web vocabulary is billions of keys."""

    SF = "/root/testdata/sf0.001"

    def test_unigram_table_bounded(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import fit_unigram_table

        table, oov = fit_unigram_table(self.SF, vocab_cap=5)
        assert len(table) <= 5
        # OOV floor is below every in-table score (count 1 vs count >= 1
        # of the top words)
        assert oov <= min(table.values())
        assert "" not in table  # the totals sentinel never leaks

    def test_idf_table_bounded(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import fit_idf_table

        table, oov = fit_idf_table(self.SF, vocab_cap=5)
        assert len(table) <= 5
        # OOV default is df=1 -> the maximum idf
        assert oov >= max(table.values())
        assert "" not in table

    def test_ratio_table_bounded(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import fit_ratio_table

        table, _oov = fit_ratio_table(self.SF, vocab_cap=5)
        assert len(table) <= 5
        assert "" not in table

    def test_bigram_table_bounded(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.analysis import fit_bigram_table

        bigram, backoff, oov = fit_bigram_table(self.SF, vocab_cap=5)
        # the broadcast model is <= 2V+1 entries total
        assert len(bigram) <= 5 and len(backoff) <= 5
        # every capped bigram's words are in the capped unigram vocab
        for w1, w2 in bigram:
            assert w1 in backoff and w2 in backoff
        # OOV backoff (count 1) is below every in-vocab backoff, and an
        # observed bigram always scores above its pure-backoff floor
        assert oov <= min(backoff.values())
        for (_w1, w2), m in bigram.items():
            assert m > backoff[w2]

    def test_perplexity_paths_bind(self, ray_session, quiet_data_context):
        # with V=5 on the 31-word vocab all three scoring paths (capped
        # bigram, unigram backoff, OOV floor) must fire; short docs get
        # the -1 sentinel iff they have < 2 words
        from pdf_parser_ray.pipelines.analysis import perplexity_scores

        df = perplexity_scores(self.SF, vocab_cap=5).to_pandas()
        assert (df.loc[df["n_bigrams"] == 0, "ppl_micros"] == -1).all()
        scored = df[df["n_bigrams"] > 0]
        assert (scored["ppl_micros"] > 0).all()
        assert (scored["logprob_micros"] < 0).all()

    def test_cap_keeps_most_frequent(self, ray_session, quiet_data_context):
        # capped fit = the top-V rows of the uncapped fit (count DESC,
        # word ASC tie-break), same scores — the cap only prunes
        from pdf_parser_ray.pipelines.analysis import fit_unigram_table

        full, _ = fit_unigram_table(self.SF, vocab_cap=1 << 20)
        capped, _ = fit_unigram_table(self.SF, vocab_cap=5)
        assert set(capped) <= set(full)
        for w, m in capped.items():
            assert full[w] == m


class TestStratifiedSample:
    SF = "/root/testdata/sf0.001"

    def test_balanced_within_tolerance(self, ray_session, quiet_data_context):
        """Every language stratum lands near the per_stratum target
        (hash sampling: expected N, binomial spread), where uniform
        corpus sampling would mirror the language skew instead."""
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.filter import stratified_sample

        df = stratified_sample(self.SF, per_stratum=50).to_pandas()
        got = df.groupby("lang").size()
        langs = set(
            pq.read_table(self.SF + "/documents.parquet", columns=["lang"])
            .column("lang")
            .to_pylist()
        )
        assert set(got.index) == langs
        for lang, n in got.items():
            # expected 50 (or the full stratum if smaller); 3-sigma-ish
            assert 20 <= n <= 85, (lang, n)

    def test_deterministic(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import stratified_sample

        a = stratified_sample(self.SF).to_pandas().sort_values("doc_id")
        b = stratified_sample(self.SF).to_pandas().sort_values("doc_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestC4LineFilter:
    def test_line_predicate(self):
        from pdf_parser_ray.pipelines.filter import c4_line_keep

        assert c4_line_keep("three proper words.")
        assert c4_line_keep('quoted sentence ends right"')
        assert not c4_line_keep("no terminal punctuation here")
        assert not c4_line_keep("two words.")
        assert not c4_line_keep("please enable JavaScript now.")

    def test_page_rules_ordered(self):
        from pdf_parser_ray.pipelines.filter import c4_page_verdict

        good = ["one fine line."] * 3
        assert c4_page_verdict(good)[0] == "ok"
        # curly brace wins over lorem ipsum wins over too-few
        assert c4_page_verdict(["a { b", "lorem ipsum."])[0] == "curly_brace"
        assert c4_page_verdict(["has lorem ipsum."])[0] == "lorem_ipsum"
        assert c4_page_verdict(["one fine line."] * 2)[0] == "too_few_sentences"

    def test_synth_deterministic_and_diverse(self):
        from pdf_parser_ray.pipelines.filter import (
            c4_page_verdict,
            synth_page_lines,
        )

        text = " ".join(f"w{i}" for i in range(40))
        assert synth_page_lines(7, text) == synth_page_lines(7, text)
        reasons = {
            c4_page_verdict(synth_page_lines(i, text))[0] for i in range(60)
        }
        assert {"ok", "curly_brace", "lorem_ipsum"} <= reasons

    def test_clean_text_only_kept_lines(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import c4_line_filter, c4_line_keep

        df = c4_line_filter("/root/testdata/sf0.001").to_pandas()
        assert (df["keep"] == (df["reason"] == "ok").astype(int)).all()
        assert (df.loc[df.keep == 0, "clean_text"] == "").all()
        kept = df[df.keep == 1]
        assert len(kept) > 0
        for t in kept["clean_text"].head(20):
            assert all(c4_line_keep(ln) for ln in t.split("\n"))


class TestLeakageSafeSplit:
    def test_group_atomicity_and_balance(self, ray_session, quiet_data_context):
        """The leakage-safety property: a source never straddles the
        boundary, and both splits are populated."""
        from pdf_parser_ray.pipelines.filter import leakage_safe_split

        df = leakage_safe_split("/root/testdata/sf0.01").to_pandas()
        per_source = df.groupby("source")["split"].nunique()
        assert (per_source == 1).all()
        assert set(df["split"].unique()) == {"train", "val"}

    def test_deterministic(self):
        from pdf_parser_ray.pipelines.filter import split_of

        assert split_of("web-03") == split_of("web-03")
        # permille sweep is monotone: raising the cut only moves
        # sources from train to val, never the reverse
        for s in ("a", "b", "c", "web-1", "web-2"):
            seen_val = False
            for pm in range(0, 1001, 100):
                v = split_of(s, pm) == "val"
                assert v or not seen_val
                seen_val = seen_val or v
            assert split_of(s, 1000) == "val"


class TestWithinDocLineDedup:
    def test_planted_dup_removed_first_kept(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import (
            dedup_lines_within_doc,
            synth_page_lines,
        )

        df = dedup_lines_within_doc("/root/testdata/sf0.001").to_pandas()
        # the planted duplicate guarantees n_unique < n_lines everywhere
        assert (df["n_unique"] < df["n_lines"]).all()
        # spot-check: clean keeps first occurrences in original order
        row = df.iloc[0]
        import pyarrow.parquet as pq

        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
        i = int(row["doc_id"])
        lines = synth_page_lines(i, texts[i])
        lines.append(lines[i % len(lines)])
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert row["clean_text"] == "\n".join(kept)


class TestSourceQualityFilter:
    def test_threshold_and_consistency(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import (
            SOURCE_MIN_OK_PCT,
            quality_filter,
            source_quality_filter,
        )

        df = source_quality_filter("/root/testdata/sf0.01").to_pandas()
        assert (
            (100 * df["n_ok"] >= SOURCE_MIN_OK_PCT * df["n_docs"])
            == (df["keep"] == 1)
        ).all()
        assert 0 < df["keep"].sum() < len(df)  # both classes fire
        # per-source ok counts agree with the per-document gate
        import pyarrow.parquet as pq

        q = quality_filter("/root/testdata/sf0.01").to_pandas()
        src = pq.read_table(
            "/root/testdata/sf0.01/documents.parquet",
            columns=["doc_id", "source"],
        ).to_pandas()
        merged = q.merge(src, on="doc_id").groupby("source")["keep"].sum()
        got = dict(zip(df["source"], df["n_ok"]))
        assert got == merged.to_dict()


class TestShuffleShards:
    def test_key_is_exact_and_unstriped(self):
        import numpy as np

        from pdf_parser_ray.pipelines.pack import SHUF_P, shuffle_key

        # int64 arithmetic must be exact even past 2^31 (ids wrap mod P
        # first, so products stay < 2^62 — no silent float or overflow)
        big = np.array([0, 1, SHUF_P - 1, SHUF_P, 2**40, 2**52 + 3], np.int64)
        k = shuffle_key(big)
        assert k.dtype == np.int64 and (k >= 0).all() and (k < SHUF_P).all()
        # doc_id = x and x + P collide by construction (mod-P wrap) ...
        assert k[0] == k[3]
        # ... but consecutive ids must NOT land in an arithmetic
        # progression (the xor fold breaks the affine stripe)
        ks = shuffle_key(np.arange(1000, dtype=np.int64))
        diffs = np.diff(ks)
        assert len(np.unique(diffs)) > 100

    def test_positions_are_global_ranks(self, ray_session, quiet_data_context):
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.pack import shuffle_key, shuffle_shards

        sf = "/root/testdata/sf0.001"
        got = (
            shuffle_shards(sf, shards=4, range_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ids = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id"]
        ).column("doc_id").to_numpy()
        assert sorted(got["doc_id"]) == sorted(ids.tolist())
        key = shuffle_key(got["doc_id"].to_numpy())
        assert (got["shard"].to_numpy() == key % 4).all()
        # pos = brute-force rank within shard by (key, doc_id)
        order = np.lexsort((got["doc_id"].to_numpy(), key))
        expect = np.empty(len(got), np.int64)
        seen: dict[int, int] = {}
        for i in order:
            s = int(key[i] % 4)
            expect[i] = seen.get(s, 0)
            seen[s] = expect[i] + 1
        assert (got["pos"].to_numpy() == expect).all()


class TestCurateAndPack:
    def test_composition_equals_stage_chain(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.dedup import exact_dedup
        from pdf_parser_ray.pipelines.filter import quality_filter
        from pdf_parser_ray.pipelines.pack import curate_and_pack, pack_sequences

        sf = "/root/testdata/sf0.001"
        got = curate_and_pack(sf).to_pandas().sort_values("doc_id")
        kept = set(
            quality_filter(sf).to_pandas().query("keep == 1")["doc_id"]
        )
        dedup_winners = set(exact_dedup(sf).to_pandas()["doc_id"])
        # survivors = quality-kept ∩ (winner among kept per text);
        # winners computed on the FULL corpus may differ only when a
        # dropped doc was the winner — every survivor must be kept, and
        # every kept winner must survive
        assert set(got["doc_id"]) <= kept
        assert (kept & dedup_winners) <= set(got["doc_id"])
        # per-bucket greedy packing invariants (same as pack_sequences)
        full = pack_sequences(sf).to_pandas().set_index("doc_id")
        for _, row in got.head(50).iterrows():
            assert row["n_tokens"] == full.loc[row["doc_id"], "n_tokens"]
        grp = got.groupby("bucket")
        assert (grp["pack_offset"].first() == 0).all()  # each bucket restarts


class TestGopherRules:
    """gopher_rules: the word-level Gopher signals (Rae et al. 2021
    §A1.1) quality_filter doesn't cover.  The oracle equality runs in
    test_oracle; here every ordered verdict branch is pinned directly
    (the synthetic corpus only fires no_stopwords/ok)."""

    def test_every_branch(self):
        from pdf_parser_ray.pipelines.filter import gopher_verdict

        assert gopher_verdict(0, 0, 0, 0) == "empty"
        # 7/10 alpha words < 80%
        assert gopher_verdict(10, 7, 5, 0) == "low_alpha"
        assert gopher_verdict(10, 9, 1, 0) == "no_stopwords"
        # 2 symbol chars over 10 words > 10%
        assert gopher_verdict(10, 9, 2, 2) == "symbol_heavy"
        assert gopher_verdict(10, 9, 2, 1) == "ok"
        # rule ORDER: low_alpha wins over no_stopwords and symbol_heavy
        assert gopher_verdict(10, 0, 0, 10) == "low_alpha"

    def test_counts_match_python_reference(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import (
            _GOPHER_STOPSET, gopher_rules,
        )
        import pyarrow.parquet as pq
        import re

        sf = "/root/testdata/sf0.001"
        got = (
            gopher_rules(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        docs = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == list(docs["doc_id"])
        alpha = re.compile(r"[A-Za-z]")
        for i in range(0, len(docs), 37):  # spot-check a spread of rows
            words = docs.loc[i, "text"].split()
            assert got.loc[i, "n_words"] == len(words)
            assert got.loc[i, "alpha_words"] == sum(
                1 for w in words if alpha.search(w)
            )
            assert got.loc[i, "stop_hits"] == sum(
                1 for w in words if w.lower() in _GOPHER_STOPSET
            )


class TestBadwordsVerdict:
    """Rule order and integer-exact threshold of the flagged-word gate
    (C4 hard-drop / RefinedWeb soft-fraction composite)."""

    def test_empty(self):
        from pdf_parser_ray.pipelines.filter import badwords_verdict

        assert badwords_verdict(0, 0, 0) == "empty"

    def test_single_hard_hit_drops(self):
        from pdf_parser_ray.pipelines.filter import badwords_verdict

        assert badwords_verdict(1000, 1, 0) == "hard_bad"

    def test_soft_fraction_threshold_exact(self):
        # BAD_WORD_PCT=6: 6 soft hits in 100 words is 100*6 == 6*100,
        # NOT strictly greater -> ok; 7 hits crosses
        from pdf_parser_ray.pipelines.filter import badwords_verdict

        assert badwords_verdict(100, 0, 6) == "ok"
        assert badwords_verdict(100, 0, 7) == "bad_fraction"

    def test_hard_beats_fraction(self):
        from pdf_parser_ray.pipelines.filter import badwords_verdict

        assert badwords_verdict(10, 1, 9) == "hard_bad"

    def test_all_classes_fire_on_corpus(self, ray_session, quiet_data_context):
        # the lists were chosen from the synthetic vocabulary so the
        # gate is live, not vacuous
        from pdf_parser_ray.pipelines.filter import badwords_filter

        df = badwords_filter("/root/testdata/sf0.001").to_pandas()
        reasons = set(df["reason"])
        assert "hard_bad" in reasons
        assert "bad_fraction" in reasons
        assert "ok" in reasons
        assert ((df["reason"] == "ok") == (df["keep"] == 1)).all()


class TestLengthQuantileBounds:
    """The discrete-quantile rank rule (max(1, ceil(q*n)) 1-based,
    the DuckDB quantile_disc contract shared with event_quantiles)."""

    def test_uniform_histogram(self):
        from pdf_parser_ray.pipelines.filter import length_quantile_bounds

        lo, hi = length_quantile_bounds(
            list(range(1, 101)), [1] * 100, 5, 95
        )
        assert (lo, hi) == (5, 95)

    def test_unsorted_weighted_histogram(self):
        # values 2(x1), 7(x2), 10(x3): total 6; p50 rank ceil(3)=3 -> 7,
        # p100 rank 6 -> 10
        from pdf_parser_ray.pipelines.filter import length_quantile_bounds

        lo, hi = length_quantile_bounds([10, 2, 7], [3, 1, 2], 50, 100)
        assert (lo, hi) == (7, 10)

    def test_rank_floor_at_one(self):
        # tiny pct on a small corpus still picks the minimum, rank >= 1
        from pdf_parser_ray.pipelines.filter import length_quantile_bounds

        lo, hi = length_quantile_bounds([4, 9], [1, 1], 1, 99)
        assert (lo, hi) == (4, 9)

    def test_matches_duckdb_quantile_disc(self):
        import duckdb
        import numpy as np

        from pdf_parser_ray.pipelines.filter import length_quantile_bounds

        rng = np.random.RandomState(7)
        vals = rng.randint(1, 40, size=500)
        lengths, counts = np.unique(vals, return_counts=True)
        lo, hi = length_quantile_bounds(lengths, counts, 5, 95)
        got = duckdb.sql(
            "SELECT quantile_disc(v, 0.05), quantile_disc(v, 0.95)"
            " FROM (SELECT unnest(?) AS v)",
            params=[vals.tolist()],
        ).fetchone()
        assert (lo, hi) == (int(got[0]), int(got[1]))

    def test_gate_keeps_band_inclusive(self, ray_session, quiet_data_context):
        from pdf_parser_ray.pipelines.filter import length_outlier_filter

        df = length_outlier_filter("/root/testdata/sf0.001").to_pandas()
        kept = df[df["keep"] == 1]["n_words"]
        dropped = df[df["keep"] == 0]["n_words"]
        assert len(kept) > 0
        if len(dropped):  # band is inclusive: every dropped row is
            # strictly outside the kept range
            assert (
                (dropped < kept.min()) | (dropped > kept.max())
            ).all()


class TestTemperatureSample:
    """Hamilton apportionment over sqrt-temperature weights: exact
    total, deterministic tie-break, and the defining upsampling
    property (small sources get MORE than their proportional share)."""

    def test_quotas_sum_to_target(self):
        from pdf_parser_ray.pipelines.filter import temperature_quotas

        q = temperature_quotas({"a": 1000, "b": 100, "c": 10}, target=50)
        assert sum(q.values()) == 50

    def test_sqrt_upsamples_small_sources(self):
        from pdf_parser_ray.pipelines.filter import temperature_quotas

        counts = {"big": 9000, "small": 1000}
        q = temperature_quotas(counts, target=100)
        # proportional would give small 10; sqrt temperature gives
        # 1000/(3000+1000)·sqrt-weighted = 25
        assert q["small"] > 100 * counts["small"] // sum(counts.values())

    def test_remainder_tie_breaks_on_source_asc(self):
        from pdf_parser_ray.pipelines.filter import temperature_quotas

        # identical counts -> identical remainders; the odd leftover
        # must go to the alphabetically first source
        q = temperature_quotas({"x": 100, "y": 100, "z": 100}, target=7)
        assert (q["x"], q["y"], q["z"]) == (3, 2, 2)

    def test_sample_honors_quotas(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.filter import (
            TEMP_TARGET, temperature_quotas, temperature_sample,
        )

        sf = "/root/testdata/sf0.001"
        got = temperature_sample(sf).to_pandas()
        src = (
            pq.read_table(sf + "/documents.parquet", columns=["source"])
            .column("source")
            .to_pandas()
        )
        quotas = temperature_quotas(src.value_counts().to_dict())
        per_source = got.groupby("source").size().to_dict()
        for s, q in quotas.items():
            assert per_source.get(s, 0) == min(q, int((src == s).sum()))
        assert len(got) <= TEMP_TARGET
        assert got["doc_id"].is_unique


class TestWebCurate:
    """The composition must agree with its standalone stages — gates
    bind, dedup dedups, the mixture honors the survivor quotas."""

    def test_stages_bind_and_quota_honored(self, ray_session, quiet_data_context):
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.curate import WEB_CURATE_TARGET, web_curate
        from pdf_parser_ray.pipelines.filter import (
            badwords_filter, gopher_rules, temperature_quotas,
        )

        sf = "/root/testdata/sf0.001"
        got = web_curate(sf).to_pandas()
        n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
        g = gopher_rules(sf).to_pandas().set_index("doc_id")["keep"]
        b = badwords_filter(sf).to_pandas().set_index("doc_id")["keep"]
        survivors = ((g == 1) & (b == 1)).sum()
        assert 0 < survivors < n_docs  # both gates actually fire
        assert 0 < len(got) <= WEB_CURATE_TARGET
        assert got["doc_id"].is_unique
        # every selected doc passed both gates
        assert (g.loc[got["doc_id"]] == 1).all()
        assert (b.loc[got["doc_id"]] == 1).all()
        # the mixture upsamples small sources: no single source may
        # dominate the draw the way it could dominate the raw corpus
        per_source = got.groupby("source").size()
        assert per_source.max() <= WEB_CURATE_TARGET // 2
        # quotas over any count vector always sum to the target
        assert (
            sum(
                temperature_quotas(
                    per_source.to_dict(), WEB_CURATE_TARGET
                ).values()
            )
            == WEB_CURATE_TARGET
        )


class TestWeightedPrioritySample:
    def test_matches_brute_force_and_favors_weight(
        self, ray_session, quiet_data_context
    ):
        """Exact top-k equality vs a numpy brute force, and the weighted
        property: the sample's mean n_chars must exceed the corpus mean
        (heavier docs are favored ∝ weight)."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.pack import (
            SHUF_P, WPS_K, shuffle_key, weighted_priority_sample,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            weighted_priority_sample(sf)
            .to_pandas()
            .reset_index(drop=True)
        )
        d = pq.read_table(
            sf + "/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()
        ids = d["doc_id"].to_numpy(np.int64)
        w = d["n_chars"].to_numpy(np.int64)
        pri = (w * SHUF_P) // (shuffle_key(ids) + 1)
        order = np.lexsort((ids, -pri))[:WPS_K]
        assert got["doc_id"].tolist() == ids[order].tolist()
        assert got["priority"].tolist() == pri[order].tolist()
        assert len(got) == WPS_K
        # weighting binds: the priority-sampled panel skews heavy
        assert got["n_chars"].mean() > d["n_chars"].mean()
        # and differs from the unweighted uniform panel
        from pdf_parser_ray.pipelines.pack import uniform_sample_k

        uni = uniform_sample_k(sf).to_pandas()
        assert set(got["doc_id"]) != set(uni["doc_id"])


class TestShardBalanceReport:
    def test_matches_shuffle_shards(self, ray_session, quiet_data_context):
        """Per-shard doc counts must equal shuffle_shards' actual shard
        sizes (same hash, same assignment) and char loads conserve."""
        import numpy as np
        import pyarrow.parquet as pq

        from pdf_parser_ray.pipelines.pack import (
            SHUF_SHARDS, shard_balance_report, shuffle_shards,
        )

        sf = "/root/testdata/sf0.001"
        got = (
            shard_balance_report(sf)
            .to_pandas()
            .set_index("shard")
            .sort_index()
        )
        assert len(got) == SHUF_SHARDS
        sizes = (
            shuffle_shards(sf)
            .to_pandas()
            .groupby("shard")
            .size()
        )
        for s, n in sizes.items():
            assert got.loc[s, "n_docs"] == n
        total_chars = int(
            pq.read_table(sf + "/documents.parquet", columns=["n_chars"])
            .column("n_chars")
            .to_numpy()
            .sum()
        )
        assert got["n_chars"].sum() == total_chars
        # loads hover around even (1e6) but are not constant
        assert got["load_micros"].min() < 1_000_000 < got["load_micros"].max()
