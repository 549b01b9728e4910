from .neat import NeatConfig, init_neat, neat_forward, render_rgb
from .loss import LossConfig, neat_loss
from .line_lift import lift_line_points, minstance_loss, two_view_lift
