from bigdataingestion_spark.config.crypto import decrypt_value, encrypt_value, register_crypto_udfs
from bigdataingestion_spark.config.repository import ConfigRepository
from bigdataingestion_spark.config.state import TableLoadDetails

__all__ = [
    "ConfigRepository",
    "TableLoadDetails",
    "decrypt_value",
    "encrypt_value",
    "register_crypto_udfs",
]
