"""BPE trainer cross-check against an independent pure-Python
implementation (Sennrich et al. 2016 greedy merge), plus the
non-increasing best-pair-count invariant the docstring claims."""

from __future__ import annotations

from collections import Counter

from web_scraper_v1_spark import queries as Q

SF = "/root/testdata/sf0.001"
K = 6


def _py_bpe(word_freqs: dict[str, int], k: int):
    syms = {w: [c for c in w] for w in word_freqs}
    merges = []
    for r in range(1, k + 1):
        counts: Counter = Counter()
        for w, s in syms.items():
            f = word_freqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _word_freqs(spark) -> dict[str, int]:
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    wf: Counter = Counter()
    for r in rows:
        for w in r["text"].strip().lower().split():
            wf[w] += 1
    return dict(wf)


def test_bpe_merges_match_pure_python(spark):
    got = [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in Q.queries()["bpe_train_merges"](spark, SF)
        .orderBy("merge_round")
        .collect()
    ]
    want, _ = _py_bpe(_word_freqs(spark), K)
    assert got == want


def test_bpe_best_count_non_increasing(spark):
    rows = (
        Q.queries()["bpe_train_merges"](spark, SF)
        .orderBy("merge_round")
        .collect()
    )
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bpe_encode_matches_final_vocab(spark):
    want_syms = _py_bpe(_word_freqs(spark), K)[1]
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in Q.queries()["bpe_encode"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        words = text.strip().lower().split()
        want = (len(words), sum(len(want_syms[w]) for w in words))
        assert got[doc_id] == want, doc_id
