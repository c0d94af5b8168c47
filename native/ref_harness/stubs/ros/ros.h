// Minimal ros::NodeHandle stub so the reference's ParamConfig
// (/root/reference/src/param_config.h:27-122) compiles headlessly.
// Parameters are loaded from a flat "key value" text file (one per line,
// '#' comments), path given by the REF_HARNESS_PARAMS environment variable
// or set programmatically via ros::stub::LoadParams().
#ifndef REF_HARNESS_ROS_ROS_H
#define REF_HARNESS_ROS_ROS_H

#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>

namespace ros {
namespace stub {

inline std::map<std::string, std::string>& params() {
  static std::map<std::string, std::string> p;
  return p;
}

inline void LoadParams(const std::string& path) {
  std::ifstream in(path);
  if (!in) {
    std::cerr << "ref_harness: cannot open param file " << path << std::endl;
    std::abort();
  }
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key, value;
    if (ss >> key >> value) params()[key] = value;
  }
}

inline void EnsureLoaded() {
  static bool loaded = false;
  if (!loaded) {
    loaded = true;
    const char* path = std::getenv("REF_HARNESS_PARAMS");
    if (path != nullptr) LoadParams(path);
  }
}

template <typename T>
inline T Parse(const std::string& s);

template <>
inline std::string Parse<std::string>(const std::string& s) {
  // Strip optional quotes (the reference YAMLs quote frame/topic names).
  if (s.size() >= 2 && (s.front() == '"' || s.front() == '\'')) {
    return s.substr(1, s.size() - 2);
  }
  return s;
}

template <>
inline bool Parse<bool>(const std::string& s) {
  return s == "true" || s == "True" || s == "1";
}

template <>
inline double Parse<double>(const std::string& s) {
  return std::stod(s);
}

template <>
inline int Parse<int>(const std::string& s) {
  // YAML ints may be written as floats ("70.0"); round like rosparam.
  return static_cast<int>(std::stod(s) + 0.5);
}

}  // namespace stub

class NodeHandle {
 public:
  NodeHandle() { stub::EnsureLoaded(); }

  template <typename T>
  void param(const std::string& name, T& out, const T& default_value) const {
    auto it = stub::params().find(name);
    out = (it == stub::params().end()) ? default_value
                                       : stub::Parse<T>(it->second);
  }
};

}  // namespace ros

#endif  // REF_HARNESS_ROS_ROS_H
