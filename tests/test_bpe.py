"""Distributed BPE: parity with a local reference implementation, and
encode-side goldens. The distributed trainer must produce EXACTLY the
merge sequence the sequential algorithm produces (same tie-break), or
tokenizations drift between training runs — the one thing a tokenizer
must never do."""

from __future__ import annotations

from collections import Counter

from hw_kafka_flink_health_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_py,
    bpe_train,
)
from tests.conftest import SF_DIR


def local_bpe_train(word_freqs: dict[str, int], n_merges: int):
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict[tuple, int] = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + f
        vocab = nxt
    return merges


def test_bpe_train_matches_local_reference(spark):
    """20 merges trained distributed == 20 merges trained sequentially
    on the identical word-frequency table."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.select("text").collect()
    freqs: Counter = Counter()
    for r in rows:
        for w in str(r["text"]).lower().split():
            if w:
                freqs[w] += 1
    expect = local_bpe_train(dict(freqs), 20)
    got = bpe_train(docs, n_merges=20)
    assert got == expect


def test_bpe_encode_goldens_and_distributed_counts(spark):
    """Greedy rank-order encoding goldens + the mapInPandas encoder
    agrees with the pure-Python encoder per document."""
    ranks = {("a", "a"): 0, ("aa", "b"): 1}
    assert bpe_encode_py("aaaa", ranks) == ["aa", "aa"]
    # 'aaab' -> merge (a,a) L->R: ['aa','a','b']; remaining adjacencies
    # ('aa','a') and ('a','b') hold no rank, so encoding stops there
    assert bpe_encode_py("aaab", ranks) == ["aa", "a", "b"]
    assert bpe_encode_py("aab", ranks) == ["aab"]  # (a,a) then (aa,b)

    docs = spark.createDataFrame(
        [(1, "aaaa aab banana"), (2, "aa aa aa")], ["doc_id", "text"]
    )
    merges = [("a", "a"), ("a", "n")]
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe_encode(docs, merges).collect()
    }
    rk = {p: i for i, p in enumerate(merges)}
    exp1 = sum(len(bpe_encode_py(w, rk)) for w in "aaaa aab banana".split())
    exp2 = sum(len(bpe_encode_py(w, rk)) for w in "aa aa aa".split())
    assert got == {1: (exp1, 3), 2: (exp2, 3)}
