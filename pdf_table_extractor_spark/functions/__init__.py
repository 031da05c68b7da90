"""Column-expression library: the reference's scalar/line logic as Catalyst
expressions (whole-stage-codegen'd, JVM-side — never per-row Python)."""

from pdf_table_extractor_spark.functions.money import (  # noqa: F401
    br_money_to_decimal,
    extract_money_cd,
    extract_money_paren_sign,
    extract_money_rs,
    extract_money_trailing_hyphen,
    sign_by_keywords,
)
from pdf_table_extractor_spark.functions.dates import (  # noqa: F401
    coalesce_to_date,
    month_name_pt_to_number,
)
from pdf_table_extractor_spark.functions.textops import (  # noqa: F401
    squeeze_ws,
    strip_quotes,
)
from pdf_table_extractor_spark.functions.windows import (  # noqa: F401
    bfill,
    doc_scalar,
    ffill,
    section_gate,
    segment_id,
)
