"""Device (TPU) front-ends.  Importing this package — which only
happens when a device path is actually enabled — turns on the
persistent XLA compilation cache so every fixed-shape device program
compiles once per machine (utils/jaxcache.py)."""

from daala_tpu.utils import jaxcache as _jaxcache

_jaxcache.ensure()
