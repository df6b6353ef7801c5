"""Registrar + credential-bootstrap parity tests (insert_Postgres_Configs.py
and ING:64-144 semantics)."""

from __future__ import annotations

import base64

import pytest

from bigdataingestion_spark.config.crypto import decrypt_value, encrypt_value
from bigdataingestion_spark.config.repository import ConfigRepository
from bigdataingestion_spark.pipeline.credentials import (
    get_scope_name,
    load_credentials,
)
from bigdataingestion_spark.pipeline.registrar import register_configs


def test_registrar_new_database_inserts_both(tmp_path):
    repo = ConfigRepository(str(tmp_path / "c.parquet"))
    res = register_configs(
        repo,
        database_config_name="reliefvet_db_name",
        database_name="reliefvet",
        table_config_name="reliefvet_tables",
        tables_name="Hospital,Status",
        watermark_config_name="reliefvet_hospital_watermarks",
        watermarks_name="CreatedDate, LastModifiedDate",
    )
    assert "reliefvet_db_name" in res.inserted
    assert "reliefvet_tables" in res.inserted
    assert repo.get_value("dcx_postgresql_db_settings", "reliefvet_db_name") == "reliefvet"
    assert repo.get_value("dcx_postgresql_table_settings", "reliefvet_tables") == "Hospital,Status"
    # watermark CSV is stripped (CFG:95-101)
    assert (
        repo.get_value("dcx_postgresql_watermark_settings", "reliefvet_hospital_watermarks")
        == "CreatedDate,LastModifiedDate"
    )


def test_registrar_existing_database_updates_csv_with_prefixing(tmp_path):
    repo = ConfigRepository(str(tmp_path / "c.parquet"))
    register_configs(
        repo, "reliefvet_db_name", "reliefvet", "reliefvet_tables", "Hospital,Status"
    )
    # second registration: 'Hospital' collides with a known table -> task_ prefix
    res = register_configs(
        repo, "reliefvet_db_name", "reliefvet", "reliefvet_tables", "Hospital,NewTable"
    )
    assert res.updated == ["reliefvet_tables"]
    assert (
        repo.get_value("dcx_postgresql_table_settings", "reliefvet_tables")
        == "Hospital,Status,reliefvet_Hospital,NewTable"
    )


def test_registrar_watermark_never_updated(tmp_path):
    repo = ConfigRepository(str(tmp_path / "c.parquet"))
    register_configs(
        repo, "x_db_name", "x", "x_tables", "T",
        watermark_config_name="x_t_watermarks", watermarks_name="CreatedDate",
    )
    res = register_configs(
        repo, "x_db_name", "x", "x_tables", "T2",
        watermark_config_name="x_t_watermarks", watermarks_name="Other",
    )
    assert "x_t_watermarks" in res.skipped
    assert (
        repo.get_value("dcx_postgresql_watermark_settings", "x_t_watermarks")
        == "CreatedDate"
    )


@pytest.fixture()
def cred_repo(tmp_path):
    repo = ConfigRepository(str(tmp_path / "c.parquet"))
    repo.insert("keyvault settings", "config scopename", "prod-scope")
    secret = "vault-secret-value"
    encoded_pw = base64.b64encode(b"p@ssw0rd").decode("ascii")
    repo.insert("urgentcare settings", "urgentcare server name", "db.example.internal")
    repo.insert("urgentcare settings", "urgentcare userid", "ingest_user")
    repo.insert(
        "urgentcare settings",
        "urgentcare pass",
        encrypt_value(secret, encoded_pw),
        is_encrypt="Yes",
    )
    repo.insert("urgentcare settings", "urgentcare filepath", "/lake/raw/")
    return repo, secret


def test_load_credentials_full_chain(spark, cred_repo):
    repo, secret = cred_repo
    creds = load_credentials(
        spark, repo, secret_provider=lambda scope, key: secret
    )
    assert creds.server == "db.example.internal"
    assert creds.user == "ingest_user"
    assert creds.password == "p@ssw0rd"  # decrypt UDF + base64 decode applied
    assert creds.filepath == "/lake/raw/"


def test_crypto_roundtrip_and_tamper_detection():
    secret = "vault-secret-value"
    ct = encrypt_value(secret, "p@ssw0rd")
    assert decrypt_value(secret, ct) == "p@ssw0rd"

    # flip one byte anywhere in the blob -> clean auth error, never garbage
    blob = bytearray(base64.b64decode(ct))
    for pos in (0, len(blob) // 2, len(blob) - 1):  # nonce, ciphertext, tag
        tampered = bytearray(blob)
        tampered[pos] ^= 0x01
        bad = base64.b64encode(bytes(tampered)).decode("ascii")
        with pytest.raises(ValueError, match="authentication failed"):
            decrypt_value(secret, bad)

    # wrong key is an auth error too (not silently-wrong plaintext)
    with pytest.raises(ValueError, match="authentication failed"):
        decrypt_value("other-secret", ct)

    # truncated blob (e.g. legacy un-MACed value) fails loudly
    short = base64.b64encode(base64.b64decode(ct)[:20]).decode("ascii")
    with pytest.raises(ValueError, match="too short"):
        decrypt_value(secret, short)


def test_missing_scope_raises(tmp_path):
    repo = ConfigRepository(str(tmp_path / "empty.parquet"))
    with pytest.raises(RuntimeError, match="scope_name"):
        get_scope_name(repo)


def test_missing_credential_raises(spark, tmp_path):
    repo = ConfigRepository(str(tmp_path / "c.parquet"))
    repo.insert("keyvault settings", "config scopename", "s")
    repo.insert("urgentcare settings", "urgentcare server name", "h")
    with pytest.raises(RuntimeError, match="missing credential"):
        load_credentials(spark, repo, secret_provider=lambda a, b: "x")
