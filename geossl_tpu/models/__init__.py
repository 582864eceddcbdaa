from geossl_tpu.models.schnet import SchNet
from geossl_tpu.models.painn import PaiNN
