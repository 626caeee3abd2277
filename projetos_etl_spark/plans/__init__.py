from projetos_etl_spark.plans.inspect import (  # noqa: F401
    codegen_stage_count,
    explain_str,
    has_operator,
    pushed_filters,
    read_schemas,
)
