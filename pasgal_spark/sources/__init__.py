from pasgal_spark.sources.pages import (  # noqa: F401
    PAGES_CTE,
    pages_from_documents,
    synthesize_pages,
)
from pasgal_spark.sources.extract import (  # noqa: F401
    extract_links,
    extract_text,
    links_to_edges,
)
