from geossl_tpu.models.schnet import SchNet
