"""Symmetric config-value encryption and the SQL ``decrypt`` function.

The reference calls a SQL-registered ``decrypt(secret, value)`` provided by an
external "cryptology" notebook that is not in the repo
(``PostgresToDataLake_Ingestion_Notebook.py:43, :128``), so the algorithm is
invisible; only the *signature* and usage (decrypt a config_value with a Key
Vault secret, then base64-decode the result downstream, ING:140) are part of
the contract. We define our own scheme behind the same signature:

    ciphertext = base64( nonce || keystream_xor(plaintext) || tag )
    keystream  = SHA-256(secret || nonce || counter) blocks (CTR construction)
    tag        = HMAC-SHA256(mac_key, nonce || keystream_xor(plaintext))
    mac_key    = SHA-256("mac:" || secret)   (domain-separated from keystream)

A fresh random 16-byte nonce per value keys the keystream, so two values
encrypted under the same secret never share a keystream (no two-time pad).
Encrypt-then-MAC: ``decrypt_value`` verifies the tag (constant-time compare)
BEFORE touching the ciphertext, so a flipped byte anywhere in the blob is a
clean ``ValueError``, never silently-garbled credentials. This is
driver-side metadata crypto for a handful of config rows — not a data path —
so a dependency-free construction beats pulling in a crypto library the
container doesn't have.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType

_NONCE_LEN = 16
_TAG_LEN = 32


def _mac_key(secret: str) -> bytes:
    return hashlib.sha256(b"mac:" + secret.encode("utf-8")).digest()


def _keystream(secret: str, nonce: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out.extend(
            hashlib.sha256(
                secret.encode() + b":" + nonce + b":" + str(counter).encode()
            ).digest()
        )
        counter += 1
    return bytes(out[:n])


def encrypt_value(secret: str, plaintext: str) -> str:
    data = plaintext.encode("utf-8")
    nonce = os.urandom(_NONCE_LEN)
    ks = _keystream(secret, nonce, len(data))
    ct = bytes(a ^ b for a, b in zip(data, ks))
    tag = hmac.new(_mac_key(secret), nonce + ct, hashlib.sha256).digest()
    return base64.b64encode(nonce + ct + tag).decode("ascii")


def decrypt_value(secret: str, ciphertext: str) -> str:
    blob = base64.b64decode(ciphertext.encode("ascii"))
    if len(blob) < _NONCE_LEN + _TAG_LEN:
        raise ValueError("ciphertext too short: missing nonce or tag")
    nonce, ct, tag = (
        blob[:_NONCE_LEN],
        blob[_NONCE_LEN:-_TAG_LEN],
        blob[-_TAG_LEN:],
    )
    want = hmac.new(_mac_key(secret), nonce + ct, hashlib.sha256).digest()
    if not hmac.compare_digest(tag, want):
        raise ValueError("ciphertext authentication failed (wrong key or tampered)")
    ks = _keystream(secret, nonce, len(ct))
    return bytes(a ^ b for a, b in zip(ct, ks)).decode("utf-8")


def register_crypto_udfs(spark: SparkSession) -> None:
    """Register SQL ``decrypt``/``encrypt`` with the reference's signature
    (usable as ``SELECT decrypt('{secret}', config_value) ...``, ING:128)."""
    spark.udf.register("decrypt", decrypt_value, StringType())
    spark.udf.register("encrypt", encrypt_value, StringType())
