"""Sources: deterministic synthetic Common-Crawl-style corpus + readers."""
