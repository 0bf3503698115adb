from dgsqp_tpu.dynamics.model_types import (ModelConfig, DynamicsConfig, DynamicBicycleConfig,
                                            KinematicBicycleConfig, PointMassConfig,
                                            UnicycleConfig, MultiAgentModelConfig)
from dgsqp_tpu.dynamics.models import (DynamicsModel, IntegratorModel, KinematicUnicycle,
                                       KinematicClUnicycle, KinematicUnicycleCombined,
                                       KinematicBicycle, KinematicCLBicycle,
                                       KinematicCLVelBicycle, KinematicBicycleCombined,
                                       DynamicBicycle, DynamicCLBicycle, DynamicBicycleCombined,
                                       get_dynamics_model)
from dgsqp_tpu.dynamics.multi_agent import MultiAgentDynamicsModel
from dgsqp_tpu.dynamics.simulator import DynamicsSimulator
