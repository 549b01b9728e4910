from .neat import NeatConfig, init_neat, neat_forward, render_rgb
from .loss import LossConfig, neat_loss
