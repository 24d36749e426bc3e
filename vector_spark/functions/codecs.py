"""Compression / crypto codecs — the VRL Codec+Cryptography functions that
need byte-level work (reference cue docs: decode_gzip.cue, encode_gzip.cue,
decode_zlib.cue, encode_zlib.cue, decode_zstd.cue, encode_zstd.cue,
decode_mime_q.cue, hmac.cue, sha3.cue, encrypt.cue, decrypt.cue).

Execution policy:
- JVM built-ins where they exist: percent encoding (`url_encode/decode`),
  AES encrypt/decrypt (`aes_encrypt/aes_decrypt` — GCM/CBC/ECB modes).
- Arrow-batched pandas UDFs for gzip/zlib/zstd/hmac/sha3/mime-q: the
  per-element work is C-level (zlib, hashlib), Python only drives the
  batch loop.  These are the documented "UDFs are the slow path"
  exceptions — there is no JVM surface for them in pyspark.sql.functions.
- zstd rides pyarrow's bundled C codec (`pa.compress` emits standard
  RFC 8878 frames; `pa.CompressedInputStream` decompresses without a
  size hint) — preferred over the `zstandard` wheel, which this
  environment lacks; the wheel is used when present.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import hmac as _hmac
import zlib as _zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - not present in this environment
    import zstandard as _zstd
except ImportError:
    _zstd = None


def _zstd_compress(b: bytes) -> bytes:
    if _zstd is not None:
        return _zstd.ZstdCompressor().compress(b)
    import pyarrow as pa

    return pa.compress(b, codec="zstd", asbytes=True)


def _zstd_decompress(b: bytes) -> bytes:
    if _zstd is not None:
        return _zstd.ZstdDecompressor().decompress(b)
    import pyarrow as pa

    # frames may omit the content-size header, so stream-decompress
    return bytes(pa.CompressedInputStream(pa.BufferReader(b), "zstd").read())


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _binary_map(fn):
    @pandas_udf("binary")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return udf


# --- gzip / zlib / zstd -----------------------------------------------------


def decode_gzip(col: Column | str) -> Column:
    """decode_gzip (decode_gzip.cue): gzip bytes -> original bytes; NULL in
    -> NULL out.  Cast to string for text payloads."""
    return _binary_map(_gzip.decompress)(_c(col).cast("binary"))


def encode_gzip(col: Column | str) -> Column:
    """encode_gzip: deterministic (mtime=0) gzip bytes."""
    return _binary_map(lambda b: _gzip.compress(b, mtime=0))(_c(col).cast("binary"))


def decode_zlib(col: Column | str) -> Column:
    return _binary_map(_zlib.decompress)(_c(col).cast("binary"))


def encode_zlib(col: Column | str) -> Column:
    return _binary_map(_zlib.compress)(_c(col).cast("binary"))


def decode_zstd(col: Column | str) -> Column:
    """decode_zstd (decode_zstd.cue): zstd frame -> original bytes."""
    return _binary_map(_zstd_decompress)(_c(col).cast("binary"))


def encode_zstd(col: Column | str) -> Column:
    """encode_zstd (encode_zstd.cue): deterministic zstd frame."""
    return _binary_map(_zstd_compress)(_c(col).cast("binary"))


# --- percent / mime-q -------------------------------------------------------


def encode_percent(col: Column | str) -> Column:
    """encode_percent -> JVM url_encode (no UDF)."""
    return F.url_encode(_c(col))


def decode_percent(col: Column | str) -> Column:
    return F.url_decode(_c(col))


def decode_mime_q(col: Column | str) -> Column:
    """decode_mime_q (decode_mime_q.cue): RFC-2047 encoded-words
    (=?utf-8?b?...?= / =?utf-8?q?...?=) -> decoded text."""
    from email.header import decode_header

    @pandas_udf("string")
    def udf(s: pd.Series) -> pd.Series:
        def dec(v):
            if v is None:
                return None
            parts = decode_header(v)
            return "".join(
                p.decode(enc or "utf-8", errors="replace") if isinstance(p, bytes) else p
                for p, enc in parts
            )

        return s.map(dec)

    return udf(_c(col))


# --- hmac / sha3 ------------------------------------------------------------

_HMAC_ALGOS = {
    "SHA-224": hashlib.sha224,
    "SHA-256": hashlib.sha256,
    "SHA-384": hashlib.sha384,
    "SHA-512": hashlib.sha512,
}


def hmac(col: Column | str, key: str, algorithm: str = "SHA-256") -> Column:
    """hmac (hmac.cue): keyed-hash MAC, returning raw bytes — compose with
    encode_base64/encode_base16 exactly as the cue examples do."""
    digest = _HMAC_ALGOS[algorithm]
    kb = key.encode()

    @pandas_udf("binary")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else _hmac.new(kb, bytes(v), digest).digest()
        )

    return udf(_c(col).cast("binary"))


_SHA3 = {
    "SHA3-224": hashlib.sha3_224,
    "SHA3-256": hashlib.sha3_256,
    "SHA3-384": hashlib.sha3_384,
    "SHA3-512": hashlib.sha3_512,
}


def sha3(col: Column | str, variant: str = "SHA3-512") -> Column:
    """sha3 (sha3.cue): hex digest, default SHA3-512."""
    h = _SHA3[variant]

    @pandas_udf("string")
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else h(bytes(v)).hexdigest())

    return udf(_c(col).cast("binary"))


# --- encrypt / decrypt ------------------------------------------------------

_AES_MODES = {"AES-256-GCM": "GCM", "AES-192-GCM": "GCM", "AES-128-GCM": "GCM",
              "AES-256-CBC-PKCS7": "CBC", "AES-192-CBC-PKCS7": "CBC",
              "AES-128-CBC-PKCS7": "CBC"}


def encrypt(col: Column | str, algorithm: str, key: str, iv: str) -> Column:
    """encrypt (encrypt.cue) via the JVM's aes_encrypt — supports the
    GCM/CBC-PKCS7 members of the reference's algorithm list (CFB/CTR/OFB
    members have no JVM counterpart and raise)."""
    mode = _AES_MODES.get(algorithm)
    if mode is None:
        raise ValueError(
            f"encrypt: unsupported algorithm {algorithm!r}; supported: {sorted(_AES_MODES)}"
        )
    return F.aes_encrypt(
        _c(col).cast("binary"), F.lit(key.encode()), F.lit(mode), F.lit("DEFAULT"),
        F.lit(iv.encode()),
    )


def decrypt(col: Column | str, algorithm: str, key: str) -> Column:
    """decrypt (decrypt.cue): inverse of :func:`encrypt` (IV is carried in
    the aes_encrypt output for GCM/CBC DEFAULT padding)."""
    mode = _AES_MODES.get(algorithm)
    if mode is None:
        raise ValueError(
            f"decrypt: unsupported algorithm {algorithm!r}; supported: {sorted(_AES_MODES)}"
        )
    return F.aes_decrypt(_c(col).cast("binary"), F.lit(key.encode()), F.lit(mode))
