from .configurator import Configurator
from .cmdparser import CMDParser
from .ks import parse_ks
from .stream import StreamReader, StreamWriter, FrameFormat
