/* seamlessclone_tpu.h — C ABI for the TPU seamless-clone engine.
 *
 * TPU-native counterpart of the reference's extern-C surface
 * (seamlessClone-CUDA/seamlessclone_cuda.h:6-62). Link against
 * libseamlessclone_tpu.so (build: `make -C .. capi`). The library embeds a
 * CPython interpreter that hosts the JAX/XLA engine; set SC_TPU_PYTHONPATH
 * to the repo root (or install the package) before the first call.
 *
 * Thread-safety: all entry points acquire the GIL; calls from any thread
 * serialize, mirroring the reference's single-stream design.
 */
#ifndef SEAMLESSCLONE_TPU_H_
#define SEAMLESSCLONE_TPU_H_

#ifdef __cplusplus
extern "C" {
#endif

/* Create an engine instance.
 *   device_id:    index into the visible accelerator list; -1 = default.
 *   config_json:  JSON object of engine options, e.g.
 *                 "{\"solver\": \"dst_gemm\", \"precision\": \"high\"}".
 *                 {"platform": "cpu"} forces the CPU backend.
 * Returns an opaque handle, or NULL (see sc_tpu_last_error). */
void* sc_tpu_create_instance(int device_id, const char* config_json);

/* Run one clone: paste `face` (fh x fw x 3, interleaved BGR uint8) into
 * `body` (bh x bw x 3) under `mask` (mh x mw, may be NULL = full), centered
 * at (cx, cy). The blended destination is written to `out` (bh*bw*3 bytes)
 * before return. `sync` nonzero additionally drains any in-flight work.
 * Returns 0 on success, -1 on error. */
int sc_tpu_run(void* inst, const unsigned char* face, int fh, int fw,
               const unsigned char* body, int bh, int bw,
               const unsigned char* mask, int mh, int mw,
               int cx, int cy, unsigned char* out, int sync);

/* Block until all work dispatched on this instance has completed. */
int sc_tpu_sync(void* inst);

/* Destroy the instance and release its cached executables. */
void sc_tpu_destroy(void* inst);

/* Message for the most recent failure on this thread. */
const char* sc_tpu_last_error(void);

#ifdef __cplusplus
}
#endif

#endif /* SEAMLESSCLONE_TPU_H_ */
