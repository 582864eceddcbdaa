from geossl_tpu.native import packing
