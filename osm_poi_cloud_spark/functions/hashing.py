"""Vectorized, process-independent 64-bit string hashing kernels.

Round-1 used per-string ``hashlib.blake2b`` calls inside the minhash /
simhash pandas UDFs — the single UDF-heavy dedup stage flagged in the
round-1 bench (2.7 s of the sf0.1 suite). This module replaces that
with batched numpy arithmetic over a padded byte matrix, the same
pattern already proven in ``sources/pages.py`` (splitmix64 over uint64
counter arrays).

Hash spec (all public primitives; replicated verbatim by the
independent golden-fixture oracle in ``tools/make_goldens.py``):

* ``token_hash64(tok, seed)`` = ``splitmix64(fnv1a64(bytes), salt=seed)``
  where ``bytes`` = first ``TOKEN_BYTE_CAP`` bytes of the token's utf-8
  encoding (longer tokens sharing that prefix collide — negligible for
  word-level shingling, and it bounds the per-batch byte matrix).
  Tokens must not contain NUL characters (NUL is the batch separator);
  the tokenizers below treat NUL in input text as whitespace.
* shingle hash over tokens ``t_i..t_{i+k-1}`` =
  ``splitmix64(poly, salt=k)`` with
  ``poly = ((t_i*B + t_{i+1})*B + ...)`` in uint64 wraparound
  arithmetic, ``B = 0x100000001b3`` (the FNV prime).

Why not a cryptographic hash: dedup banding needs uniformity and
process-independence, not preimage resistance; 64-bit collision rates
are identical in practice and the arithmetic form vectorizes.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
#: tokens are hashed over their first this-many utf-8 bytes
TOKEN_BYTE_CAP = 64


def splitmix64(x: np.ndarray, salt: int) -> np.ndarray:
    """Counter-based hash: uint64 -> uint64 (public splitmix64 finalizer)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        salt_mix = (np.uint64(salt % (1 << 64)) * np.uint64(0x9E3779B97F4A7C15)) & _MASK
        x = (np.asarray(x, dtype=np.uint64) + salt_mix) & _MASK
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return x ^ (x >> np.uint64(31))


def u01(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 mapped to [0, 1) doubles (synthetic-data generator)."""
    return splitmix64(x, salt).astype(np.float64) / 18446744073709551616.0


def hash_tokens(tokens: list[str], seed: int = 0) -> np.ndarray:
    """Vectorized token_hash64 over a flat token list -> (n,) uint64.

    The whole batch is utf-8-encoded in ONE C call (NUL-joined), token
    boundaries recovered from the separator scan, then FNV-1a runs as
    one masked vector op per byte column (loop length = longest capped
    token, not token count), finalized with splitmix64 keyed by ``seed``.
    """
    n = len(tokens)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer("\x00".join(tokens).encode("utf-8"), dtype=np.uint8)
    seps = np.flatnonzero(buf == 0)
    if len(seps) != n - 1:  # a token contained NUL: rare, exact fallback
        return np.array([_hash_token_slow(t, seed) for t in tokens], dtype=np.uint64)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = seps + 1
    ends = np.empty(n, dtype=np.int64)
    ends[:-1] = seps
    ends[-1] = len(buf)
    lens = np.minimum(ends - starts, TOKEN_BYTE_CAP)
    width = int(lens.max()) if n else 0
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if width > 0:
        idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
        np.clip(idx, 0, len(buf) - 1, out=idx)
        m = buf[idx]
        cols = np.arange(width, dtype=np.int64)
        with np.errstate(over="ignore"):
            for col in range(width):
                live = cols[col] < lens
                upd = (h ^ m[:, col].astype(np.uint64)) * FNV_PRIME
                h = np.where(live, upd, h)
    return splitmix64(h, seed)


def _hash_token_slow(tok: str, seed: int) -> int:
    """Scalar reference form of token_hash64 (fallback + oracle spec)."""
    h = int(FNV_OFFSET)
    for byte in tok.encode("utf-8").replace(b"\x00", b"")[:TOKEN_BYTE_CAP]:
        h = ((h ^ byte) * int(FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return int(splitmix64(np.uint64(h), seed))


def tokenize(texts, lower: bool = True) -> tuple[list[str], np.ndarray]:
    """Whitespace-tokenize a batch -> (flat token list, per-doc counts).

    ``None`` texts behave as empty. Matches the round-1 normalization
    (``text.lower().split()``)."""
    flat: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = (t or "").replace("\x00", " ")
        toks = (t.lower() if lower else t).split()
        counts[i] = len(toks)
        flat.extend(toks)
    return flat, counts


def shingle_hashes_batch(
    texts, k: int = 5, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes for a text batch.

    Returns ``(hashes, counts)``: a flat uint64 array of shingle hashes
    (NOT de-duplicated — minhash is invariant under multiplicity) and
    per-doc shingle counts. Docs with fewer than ``k`` tokens are padded
    with empty tokens so every doc yields >= 1 shingle (the round-1
    convention, which keeps ``np.minimum.reduceat`` segments non-empty).
    """
    flat: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").replace("\x00", " ").lower().split()
        if len(toks) < k:
            toks = toks + [""] * (k - len(toks))
        counts[i] = len(toks)
        flat.extend(toks)
    th = hash_tokens(flat, seed)
    total = len(th)
    if total == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(texts), dtype=np.int64)
    n_win = total - k + 1
    with np.errstate(over="ignore"):
        c = th[:n_win].copy()
        for j in range(1, k):
            c = c * FNV_PRIME + th[j : j + n_win]
    sh = splitmix64(c, k)
    # windows crossing a doc boundary are invalid: window i is valid iff
    # tokens i and i+k-1 belong to the same doc
    doc_of_token = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    valid = doc_of_token[:n_win] == doc_of_token[k - 1 :]
    return sh[valid], counts - (k - 1)


def minhash_signatures_batch(
    shingles: np.ndarray, shingle_counts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(ndocs, num_perm) minhash matrix: per permutation p,
    ``min over doc shingles of (x * a_p + b_p)`` in uint64 wraparound.

    One ``np.minimum.reduceat`` per permutation over the flat shingle
    array — no per-doc Python loop."""
    ndocs = len(shingle_counts)
    num_perm = len(a)
    sig = np.empty((ndocs, num_perm), dtype=np.uint64)
    if ndocs == 0:
        return sig
    starts = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(shingle_counts[:-1], out=starts[1:])
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            hv = shingles * a[p] + b[p]
            sig[:, p] = np.minimum.reduceat(hv, starts)
    return sig


def simhash_batch(texts, seed: int = 11) -> np.ndarray:
    """64-bit simhash per text -> (ndocs,) int64 (two's-complement view).

    Bit b of the output is set iff more than half the document's token
    hashes have bit b set (ties -> 0, the round-1 convention). Docs with
    no tokens hash to 0. Fully batched: one unpackbits + one
    ``np.add.reduceat`` over the token-bit matrix.
    """
    flat, counts = tokenize(texts)
    ndocs = len(counts)
    out = np.zeros(ndocs, dtype=np.uint64)
    if len(flat) == 0:
        return out.view(np.int64)
    th = hash_tokens(flat, seed)
    nonempty = counts > 0
    starts_all = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts_all[1:])
    starts = starts_all[nonempty]
    # per-doc per-bit counts: one shift + contiguous 1-D reduceat per
    # bit (2D unpackbits/cumsum/reduceat forms are 10-30x slower).
    # Segments between consecutive nonempty starts are exact: empty
    # docs contribute zero tokens, so they never widen a segment.
    ones = np.empty((len(starts), 64), dtype=np.int64)
    for b in range(64):
        col = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
        ones[:, b] = np.add.reduceat(col, starts)
    bit_set = (2 * ones) > counts[nonempty, None]
    powers = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    out[nonempty] = (bit_set * powers).sum(axis=1, dtype=np.uint64)
    return out.view(np.int64)
