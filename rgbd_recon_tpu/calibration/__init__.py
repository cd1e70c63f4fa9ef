from .volume import CalibrationVolume
from .rig import RigCalibration, load_rig, build_rig
from .frustum import Frustum
