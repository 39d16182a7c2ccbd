from my_feast_spark.sources.readers import (
    load_table,
    load_tables,
    map_pivot,
    parse_json_column,
    read_csv_header,
    read_parquet,
)
from my_feast_spark.sources.maintenance import compact_table
from my_feast_spark.sources.skipping import (
    scan_with_skipping,
    update_file_stats,
    write_file_stats,
)
from my_feast_spark.sources.changes_stream import read_changes_stream
from my_feast_spark.sources.versioned import (
    ChangeFeedUnavailableError,
    SchemaEvolutionError,
    VersionConflictError,
    apply_changes_version,
    checkpoint_if_due,
    checkpoint_version,
    delete_version,
    diff_versions,
    list_versions,
    read_changes,
    read_version,
    read_version_with_skipping,
    restore_version,
    upsert_version,
    vacuum,
    version_at_timestamp,
    write_version,
)
from my_feast_spark.sources.zorder import zorder_table, zvalue
from my_feast_spark.sources.readers import read_jsonl
from my_feast_spark.sources.writers import write_jsonl, write_partitioned

__all__ = [
    "load_table",
    "load_tables",
    "read_parquet",
    "read_csv_header",
    "map_pivot",
    "parse_json_column",
    "write_partitioned",
    "read_jsonl",
    "write_jsonl",
    "compact_table",
    "zorder_table",
    "write_version",
    "read_version",
    "VersionConflictError",
    "read_version_with_skipping",
    "upsert_version",
    "delete_version",
    "diff_versions",
    "restore_version",
    "version_at_timestamp",
    "checkpoint_version",
    "checkpoint_if_due",
    "SchemaEvolutionError",
    "ChangeFeedUnavailableError",
    "read_changes",
    "apply_changes_version",
    "read_changes_stream",
    "list_versions",
    "vacuum",
    "zvalue",
    "write_file_stats",
    "update_file_stats",
    "scan_with_skipping",
]
