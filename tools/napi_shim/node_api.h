/* Minimal node_api.h SHIM for compile-checking wrappers/nodejs in
 * environments without a Node toolchain (tools/binding_check.py).
 *
 * NOT the real header: it declares only the N-API surface the addon
 * uses, with ABI-compatible-enough signatures for `gcc -fsyntax-only`
 * to catch type and arity errors in OUR code. Real builds use the
 * node-gyp-provided header (wrappers/nodejs/binding.gyp).
 */
#ifndef ZXC_NAPI_SHIM_H
#define ZXC_NAPI_SHIM_H
#include <stddef.h>
#include <stdint.h>
#include <stdbool.h>

typedef struct napi_env__ *napi_env;
typedef struct napi_value__ *napi_value;
typedef struct napi_callback_info__ *napi_callback_info;

typedef enum { napi_ok, napi_generic_failure } napi_status;
typedef enum {
  napi_undefined, napi_null, napi_boolean, napi_number, napi_string,
  napi_symbol, napi_object, napi_function, napi_external, napi_bigint
} napi_valuetype;

typedef napi_value (*napi_callback)(napi_env, napi_callback_info);

#define NAPI_AUTO_LENGTH ((size_t)-1)

napi_status napi_get_cb_info(napi_env, napi_callback_info, size_t *,
                             napi_value *, napi_value *, void **);
napi_status napi_typeof(napi_env, napi_value, napi_valuetype *);
napi_status napi_is_buffer(napi_env, napi_value, bool *);
napi_status napi_get_buffer_info(napi_env, napi_value, void **, size_t *);
napi_status napi_create_buffer_copy(napi_env, size_t, const void *,
                                    void **, napi_value *);
napi_status napi_create_int64(napi_env, int64_t, napi_value *);
napi_status napi_create_uint32(napi_env, uint32_t, napi_value *);
napi_status napi_get_value_int64(napi_env, napi_value, int64_t *);
napi_status napi_get_value_bool(napi_env, napi_value, bool *);
napi_status napi_get_boolean(napi_env, bool, napi_value *);
napi_status napi_create_object(napi_env, napi_value *);
napi_status napi_is_array(napi_env, napi_value, bool *);
napi_status napi_get_array_length(napi_env, napi_value, uint32_t *);
napi_status napi_get_element(napi_env, napi_value, uint32_t, napi_value *);
napi_status napi_create_function(napi_env, const char *, size_t,
                                 napi_callback, void *, napi_value *);
napi_status napi_set_named_property(napi_env, napi_value, const char *,
                                    napi_value);
napi_status napi_throw_error(napi_env, const char *, const char *);
napi_status napi_throw_type_error(napi_env, const char *, const char *);

#define NAPI_MODULE(modname, regfunc) \
  napi_value __napi_shim_entry_##modname(napi_env env, napi_value e) { \
    return regfunc(env, e); \
  }

#endif /* ZXC_NAPI_SHIM_H */
