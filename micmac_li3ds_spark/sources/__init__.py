"""Sources & sinks beyond the file formats in ``operators/scans.py``.

``jdbc``  — JDBC read surface + config + driver-side SQL execution.
``sinks`` — JDBC write/upsert sinks (append, overwrite, staging+MERGE)
            and the foreachBatch adapters used by streaming jobs.
"""

from micmac_li3ds_spark.sources.jdbc import (  # noqa: F401
    JdbcConfig,
    derby_config,
    execute,
    read_query,
    read_table,
    table_exists,
)
from micmac_li3ds_spark.sources.sinks import (  # noqa: F401
    JdbcUpsertSink,
    merge_sql,
    write_jdbc,
)
