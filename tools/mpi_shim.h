/* Minimal single-rank MPI shim: just enough of the MPI surface to build
 * and run the reference examl binary serially for golden-number runs
 * (the reference uses only the symbols below; see SURVEY.md §5.8).
 * All collectives degenerate to memcpy at size 1. */
#ifndef MPI_SHIM_H
#define MPI_SHIM_H

#include <stdlib.h>
#include <string.h>

typedef int MPI_Comm;
typedef int MPI_Op;
typedef int MPI_Datatype;

#define MPI_COMM_WORLD 0
#define MPI_SUM 0
#define MPI_DOUBLE 8
#define MPI_INT 4
#define MPI_UNSIGNED_LONG 8
#define MPI_IN_PLACE ((void *)-1)

static int _mpi_size(MPI_Datatype t) { return t; }

static inline int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
static inline int MPI_Finalize(void) { return 0; }
static inline int MPI_Comm_rank(MPI_Comm c, int *r) { (void)c; *r = 0; return 0; }
static inline int MPI_Comm_size(MPI_Comm c, int *s) { (void)c; *s = 1; return 0; }
static inline int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }
static inline int MPI_Abort(MPI_Comm c, int e) { (void)c; exit(e); }

static inline int MPI_Allreduce(const void *send, void *recv, int n,
                                MPI_Datatype t, MPI_Op op, MPI_Comm c) {
  (void)op; (void)c;
  if (send != MPI_IN_PLACE) memcpy(recv, send, (size_t)n * _mpi_size(t));
  return 0;
}
static inline int MPI_Reduce(const void *send, void *recv, int n,
                             MPI_Datatype t, MPI_Op op, int root, MPI_Comm c) {
  (void)op; (void)root; (void)c;
  if (send != MPI_IN_PLACE) memcpy(recv, send, (size_t)n * _mpi_size(t));
  return 0;
}
static inline int MPI_Bcast(void *buf, int n, MPI_Datatype t, int root,
                            MPI_Comm c) {
  (void)buf; (void)n; (void)t; (void)root; (void)c; return 0;
}
static inline int MPI_Gatherv(const void *send, int sn, MPI_Datatype st,
                              void *recv, const int *counts, const int *displs,
                              MPI_Datatype rt, int root, MPI_Comm c) {
  (void)counts; (void)rt; (void)root; (void)c;
  memcpy((char *)recv + displs[0] * _mpi_size(st), send,
         (size_t)sn * _mpi_size(st));
  return 0;
}
static inline int MPI_Scatterv(const void *send, const int *counts,
                               const int *displs, MPI_Datatype st, void *recv,
                               int rn, MPI_Datatype rt, int root, MPI_Comm c) {
  (void)counts; (void)rt; (void)root; (void)c;
  memcpy(recv, (const char *)send + displs[0] * _mpi_size(st),
         (size_t)rn * _mpi_size(st));
  return 0;
}

#endif
