"""crawler_ray — a Ray-Data-native URL-frontier / fetch-scheduler engine.

A from-scratch reimplementation of the data-processing capabilities of the Go
crawler ``awaketai/crawler`` (reference at /root/reference, cited by file:line
in docstrings), re-expressed as idiomatic Ray Data:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``;
- stateful stages (URL-seen set, politeness) as pools of Ray actors;
- wide steps (frontier build, dedup verification) as explicit
  groupby / sort / repartition shuffles;
- declarative rule specs replacing the reference's Go/JS ParseFuncs.

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions are
owned by the test fixture, ``bench.py`` and CLI entry points only.
"""

__version__ = "0.1.0"
