from ufload_spark.functions.names import (
    db_to_instance,
    decrypt_password,
    file_to_db,
    instance_to_dir,
    match_any_wildcard,
    version_key,
)

__all__ = [
    "file_to_db",
    "db_to_instance",
    "instance_to_dir",
    "match_any_wildcard",
    "decrypt_password",
    "version_key",
]
