"""Sources and sinks (SURVEY.md §2.1): file listings, raster headers, CSV, JSON docs."""
