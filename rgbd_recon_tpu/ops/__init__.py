from .sample import sample2d, sample3d
from .colors import rgb_to_lab
