"""Independent BPE merge-sequence reference — the oracle side of the
``bpe_merges`` hash gate (VERDICT r10 #5, the last rows-only → hash
conversion; same pattern as ``operators/phash_ref``).

Deliberately implementation-independent from ``operators/bpe``:

- word frequencies come from DuckDB SQL over the SAME parquet the gate
  reads (the whitespace tokenizer twin every token-level oracle in this
  repo already uses — ``lower`` + ``\\s+`` split + empty filter), not
  from the Spark ``word_frequencies`` pass;
- the merge loop is the pure-Python reference that has pinned the
  operator's merge sequence in ``tests/test_bpe.py`` since round 6 —
  list-based segmentation, ``max`` over (count, left, right) — written
  against the classic BPE description (Sennrich et al. 2016,
  https://arxiv.org/abs/1508.07909), not against the operator's dict
  loop.

The only shared input is the corpus parquet itself; every derivation
step (tokenize → count → iterate merges) runs twice through disjoint
code, so a regression in either side breaks the hash.
"""

from __future__ import annotations

import os

# DuckDB twin of operators/text.tokens — identical to the _TOKS_SQL the
# token-level oracles (streaming_topk_tokens, bpe_token_counts) pin
_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


def ref_bpe(
    word_freqs: dict[str, int], n_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Classic BPE merge induction over a word-frequency dict.
    Tie-break: count desc, then largest (left, right) lexicographically
    — the contract ``operators/bpe._bpe_merge_loop`` implements."""
    symbols = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freqs[w]
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], p[0], p[1]))
        if counts[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for w in symbols:
            syms, out, i = symbols[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges


def ref_word_frequencies(sf_dir: str) -> dict[str, int]:
    """Word frequencies of the documents corpus via DuckDB SQL — the
    oracle-side twin of the gate's distributed Spark pass."""
    import duckdb

    path = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT unnest({_TOKS_SQL}) AS word
            FROM read_parquet('{path}')
        )
        GROUP BY word
        """
    ).fetchall()
    con.close()
    return {w: int(n) for w, n in rows}


def ref_bpe_merge_rows(
    sf_dir: str, n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, str]]:
    """(rank, left, right, merged) rows the ``bpe_merges`` gate must
    produce at ``sf_dir`` — full oracle-side recomputation."""
    wf = ref_word_frequencies(sf_dir)
    merges = ref_bpe(wf, n_merges, min_count=min_pair_count)
    return [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
