from ml_data_wrangler_spark.functions.text import (  # noqa: F401
    EMAIL_RE,
    IPV4_RE,
    MD5_RE,
    URL_RE,
    UUID_RE,
    cleanse_lines,
    cleanse_text,
    nfkc_unescape,
    pii_scrub,
    tokenize,
)
from ml_data_wrangler_spark.functions.textstats import (  # noqa: F401
    detect_language,
    doc_fingerprint,
    quality_score,
    token_count,
)
from ml_data_wrangler_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
