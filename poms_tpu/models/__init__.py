from poms_tpu.models.poisson import poisson_problem, PoissonProblem
