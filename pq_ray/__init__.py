"""pq_ray — a Ray-Data-native time-series rollup/downsample/retention engine
with the query capabilities of iximiuz/pq (PromQL-subset over parsed streams).

Layers:
- ``pq_ray.model``      shared data model (timestamps, signatures, formatting)
- ``pq_ray.fixtures``   deterministic pre-tokenized corpus generator
- ``pq_ray.stages``     Ray Data batch transforms (decode, window, rollup)
- ``pq_ray.state``      Gorilla chunk codec, checkpoint manifests
- ``pq_ray.pipelines``  tier-cascade rollup + training-data pipelines
- ``pq_ray.query``      pq program / PromQL-subset parser + batch evaluator
- ``pq_ray.format``     PromAPI/JSON formatters (bit-exact vs the reference)
- ``pq_ray.sources``    line decoders (regex / JSON) as batch transforms
"""

__version__ = "0.1.0"
