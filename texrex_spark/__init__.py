"""texrex_spark — a PySpark-native rebuild of the texrex/ClaraX web-crawl
processing system (reference: /root/reference, rsling/texrex, FreePascal).

Not a port: the reference's thread pools, bounded queues, and external
sort/merge machinery are replaced wholesale by Spark's scheduler, shuffle,
and Catalyst.  What *is* reproduced exactly is the semantics:

- deterministic Rabin-64 hashing (functions/rabin.py)
- Broder-Mitzenmacher / Almeida-et-al. bloom filters (functions/bloom.py)
- URL canonicalization + link-relation classification (functions/urlnorm.py)
- per-host politeness + robots gating (operators/politeness.py, robots.py)
- the ClaraX random-walk crawl ordering (operators/walker.py + oracle/)
- the frontier fetch scheduler at scale (operators/frontier.py)
- the texrex cleaning chain over span arrays (clean/)
- tender/tecl near-duplicate batch semantics (operators/neardup.py)
"""

__version__ = "0.1.0"
